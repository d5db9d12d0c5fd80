"""Training data pipeline: clip sampling, augmentation, CLI loop.

The reference has NO training data pipeline (tracker/model/trainer.py is
vestigial and imports a dataset module that does not exist in-tree); these
tests pin the contract of ours (training/data.py -> training/trainer.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from vosesam_tpu.eval.datasets import DavisDataset
from vosesam_tpu.eval.palette import pascal_colormap
from vosesam_tpu.training.data import ClipSampler, ClipSamplerConfig

H, W = 48, 64


def _write_tree(root, videos=("va", "vb"), n_frames=6, annotate_all=True):
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "2017", "train.txt"), "w") as f:
        f.write("\n".join(videos) + "\n")
    rng = np.random.default_rng(0)
    for v in videos:
        img_dir = os.path.join(root, "JPEGImages", "480p", v)
        ann_dir = os.path.join(root, "Annotations", "480p", v)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, (H, W, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.jpg"))
            if annotate_all or i == 0:
                m = np.zeros((H, W), np.uint8)
                m[8 + i : 20 + i, 8:24] = 1          # object 1 moves down
                m[30:44, 40 + i : 56 + i] = 2        # object 2 moves right
                pimg = Image.fromarray(m, mode="P")
                pimg.putpalette(pascal_colormap().reshape(-1).tolist())
                pimg.save(os.path.join(ann_dir, f"{i:05d}.png"))
    return root


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return _write_tree(str(tmp_path_factory.mktemp("davis_train")))


@pytest.fixture(scope="module")
def sampler(tree):
    ds = DavisDataset(tree, imset="2017/train.txt")
    return ClipSampler(
        ds, ClipSamplerConfig(seq_length=3, crop=32, min_scale=0.5),
        max_objects=3, seed=1)


class TestClipSampler:
    def test_batch_contract(self, sampler):
        frames, gt, valid = sampler.sample_batch(2)
        assert frames.shape == (2, 3, 32, 32, 3)
        assert frames.dtype == np.float32
        assert gt.shape == (2, 3, 32, 32) and gt.dtype == np.int32
        assert valid.shape == (2, 3) and valid.dtype == bool
        # labels are contiguous slots within [0, O]
        assert gt.min() >= 0 and gt.max() <= 3
        for b in range(2):
            present = set(np.unique(gt[b, 0]).tolist()) - {0}
            # every frame-0 label has its validity slot set, and slots are
            # contiguous from 1
            assert present == set(range(1, len(present) + 1))
            assert valid[b, : len(present)].all()
            assert not valid[b, len(present):].any()
        # ImageNet normalization: values centered, not raw pixels
        assert frames.min() < -0.5 and frames.max() > 0.5
        assert abs(float(frames.mean())) < 2.0

    def test_deterministic_given_seed(self, tree):
        ds = DavisDataset(tree, imset="2017/train.txt")
        cfg = ClipSamplerConfig(seq_length=3, crop=32)
        a = ClipSampler(ds, cfg, 3, seed=7).sample_batch(2)
        b = ClipSampler(ds, cfg, 3, seed=7).sample_batch(2)
        c = ClipSampler(ds, cfg, 3, seed=8).sample_batch(2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert any(not np.array_equal(x, y) for x, y in zip(a, c))

    def test_temporal_order_and_jump_bound(self, sampler):
        # frame picks must be usable repeatedly without error and the gt must
        # move (the objects translate per frame index)
        moved = False
        for _ in range(8):
            _, gt, _ = sampler.sample_clip()
            if not np.array_equal(gt[0], gt[-1]):
                moved = True
        assert moved

    def test_sparse_annotations_filtered(self, tmp_path):
        root = _write_tree(str(tmp_path), videos=("only_first",),
                           annotate_all=False)
        ds = DavisDataset(root, imset="2017/train.txt")
        with pytest.raises(ValueError, match="annotated"):
            ClipSampler(ds, ClipSamplerConfig(seq_length=2, crop=32), 2)

    def test_curriculum_hook(self, sampler):
        old = sampler.cfg.max_jump
        sampler.set_max_jump(11)
        assert sampler.cfg.max_jump == 11
        sampler.set_max_jump(old)


class TestInpaintClipSampler:
    def test_stroke_mask_properties(self):
        from vosesam_tpu.training.inpaint_data import random_stroke_mask

        rng = np.random.default_rng(2)
        ratios = []
        for _ in range(6):
            m = random_stroke_mask(rng, 120, 216)
            assert m.shape == (120, 216) and m.dtype == np.uint8
            assert set(np.unique(m)).issubset({0, 1})
            ratios.append(m.mean())
        # free-form strokes: non-degenerate hole ratios
        assert all(0.003 < r < 0.7 for r in ratios)

    def test_mask_sequence_moving_vs_static(self):
        from vosesam_tpu.training.inpaint_data import random_mask_sequence

        static = random_mask_sequence(
            np.random.default_rng(0), 4, 60, 108, moving_prob=0.0)
        assert all(np.array_equal(static[0], static[i]) for i in range(4))
        moving = random_mask_sequence(
            np.random.default_rng(0), 4, 60, 108, moving_prob=1.0)
        assert any(not np.array_equal(moving[0], moving[i]) for i in range(4))
        # motion is a drift of one field: per-frame area is conserved
        assert len({int(m.sum()) for m in moving}) == 1

    def test_sample_contract(self, tree):
        from vosesam_tpu.training.inpaint_data import InpaintClipSampler

        ds = DavisDataset(tree, imset="2017/train.txt")
        s = InpaintClipSampler(ds, num_local=3, num_nonlocal=2,
                               size=(60, 108), seed=3)
        frames, masks, nl = s.sample()
        assert nl == 3
        assert frames.shape == (5, 60, 108, 3) and frames.dtype == np.float32
        assert -1.0 <= frames.min() and frames.max() <= 1.0
        assert masks.shape == (5, 60, 108, 1) and masks.dtype == np.float32
        assert set(np.unique(masks)).issubset({0.0, 1.0})

    def test_too_short_videos_raise(self, tree):
        from vosesam_tpu.training.inpaint_data import InpaintClipSampler

        ds = DavisDataset(tree, imset="2017/train.txt")
        with pytest.raises(ValueError, match="frames"):
            InpaintClipSampler(ds, num_local=99)

    @pytest.mark.slow
    def test_gan_step_on_sampled_clip(self, tree):
        import jax
        import jax.numpy as jnp

        from vosesam_tpu.config import InpainterConfig
        from vosesam_tpu.models.e2fgvi import discriminator as D
        from vosesam_tpu.models.e2fgvi import generator as G
        from vosesam_tpu.training import inpaint_trainer as IT
        from vosesam_tpu.training.inpaint_data import InpaintClipSampler

        ds = DavisDataset(tree, imset="2017/train.txt")
        s = InpaintClipSampler(ds, num_local=2, num_nonlocal=1,
                               size=(48, 48), seed=4)
        frames, masks, nl = s.sample()
        icfg = InpainterConfig(num_blocks=1)
        state = IT.init_train_state(
            G.generator_init(jax.random.PRNGKey(0), icfg),
            D.discriminator_init(jax.random.PRNGKey(1)),
            IT.InpaintTrainConfig())
        state, metrics = IT.train_step(
            state, jnp.asarray(frames), jnp.asarray(masks), nl, icfg,
            IT.InpaintTrainConfig())
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k


class TestTrainIntegration:
    @pytest.mark.slow
    def test_train_step_on_sampled_batch(self, sampler):
        import jax
        import jax.numpy as jnp

        from vosesam_tpu.config import FrameworkConfig, MemoryConfig, XMemConfig
        from vosesam_tpu.models.xmem import network as xnet
        from vosesam_tpu.training import trainer as T

        cfg = FrameworkConfig(
            xmem=XMemConfig(key_dim=8, value_dim=16, hidden_dim=4,
                            max_objects=3),
            memory=MemoryConfig(top_k=4),
            dtype="float32",
        )
        tcfg = T.TrainConfig(lr=1e-4, seq_length=3)
        params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)
        state = T.init_train_state(params, tcfg)
        frames, gt, valid = sampler.sample_batch(2)
        state, aux = T.train_step(
            state, jnp.asarray(frames), jnp.asarray(gt), jnp.asarray(valid),
            cfg, tcfg)
        assert np.isfinite(float(aux["loss"]))

    @pytest.mark.slow
    def test_cli_end_to_end(self, tree, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        env = dict(os.environ)
        out = subprocess.run(
            [sys.executable, "scripts/train_xmem.py", "--data", tree,
             "--steps", "2", "--batch", "2", "--grad-accum", "2",
             "--seq-length", "2",
             "--crop", "32", "--max-objects", "2", "--key-dim", "8",
             "--value-dim", "16", "--hidden-dim", "4", "--save", ckpt,
             "--platform", "cpu", "--log-every", "1"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert out.returncode == 0, out.stderr[-2000:]
        assert "loss" in out.stdout and "saved" in out.stdout
        assert os.path.isdir(ckpt)
