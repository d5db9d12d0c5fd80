"""Dataset-level batched LVOS evaluation (BASELINE config 5).

BatchedGenerator (parallel/evaluation.py) drives B videos in lockstep over
the 8-device data axis; these tests pin its contract: identical masks and
scores to the sequential Tracker path (reference analogue
tools/runner.py:226-284 run one-video-at-a-time), on uneven-length videos
with non-contiguous palette labels, and a bit-identical PNG tree out of
run_model_on_longvos_set(batched=...)."""

import os

import numpy as np
import pytest
from PIL import Image

from tests.test_pipeline import fresh_ta
from vosesam_tpu.eval.datasets import LongVideoDataset
from vosesam_tpu.eval.palette import load_palette_mask, save_palette_mask
from vosesam_tpu.eval.runner import run_model_on_longvos_set
from vosesam_tpu.parallel.evaluation import BatchedGenerator

H, W = 48, 64  # matches tests/test_pipeline tiny cfg


def _video(n, seed, label, second_label=None):
    """n frames with a moving box; template uses non-contiguous labels."""
    r = np.random.default_rng(seed)
    base = r.integers(0, 255, (H, W, 3), np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        f[8 + i:22 + i, 10 + i:30 + i] = [255, 40, 40]
        if second_label is not None:
            f[30:44, 40 + i:58 + i] = [40, 255, 40]
        frames.append(f)
    tpl = np.zeros((H, W), np.uint8)
    tpl[8:22, 10:30] = label
    if second_label is not None:
        tpl[30:44, 40:58] = second_label
    return frames, tpl


def _corpus():
    """Three videos, uneven lengths, non-contiguous labels, one two-object."""
    return [
        _video(5, 1, label=3),                  # single object, label 3
        _video(3, 2, label=1, second_label=4),  # two objects, labels {1, 4}
        _video(4, 3, label=2),                  # single object, label 2
    ]


def _sequential(ta, frames, template):
    ta.xmem.clear_memory()
    masks, scores = [], []
    for i, f in enumerate(frames):
        m, _lg, _p, s = ta.xmem.track(f, template if i == 0 else None)
        masks.append(m)
        scores.append(s)
    ta.xmem.clear_memory()
    return masks, scores


class TestBatchedGeneratorEquivalence:
    def test_matches_sequential_tracker(self):
        """3 uneven videos in one lockstep batch == the per-video Tracker,
        mask-exact; scores equal on live slots."""
        ta = fresh_ta(False)
        corpus = _corpus()
        gen = BatchedGenerator(ta.xmem_params, ta.sam_params, ta.cfg)
        got = gen.run([v for v, _ in corpus], [t for _, t in corpus])

        for vi, (frames, tpl) in enumerate(corpus):
            want_masks, want_scores = _sequential(ta, frames, tpl)
            assert len(got[vi]["masks"]) == len(frames)
            for t in range(len(frames)):
                np.testing.assert_array_equal(
                    got[vi]["masks"][t], want_masks[t],
                    err_msg=f"video {vi} frame {t}")
                np.testing.assert_allclose(
                    got[vi]["scores"][t], want_scores[t],
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"video {vi} frame {t} scores")
            # labels preserved through the per-lane MaskMapper
            labels = set(np.unique(got[vi]["masks"][0]).tolist()) - {0}
            assert labels == set(np.unique(tpl).tolist()) - {0}

    def test_chunked_matches_per_frame_batched(self):
        """DP x chunked (make_batched_chunk_step): chunk=2 over the uneven
        corpus — incl. a padded tail chunk — must reproduce the per-frame
        batched path exactly (which itself equals the sequential Tracker,
        above). Refinement ON so the chunk's batched SAM path is exercised."""
        ta = fresh_ta(True)
        corpus = _corpus()
        videos = [v for v, _ in corpus]
        tpls = [t for _, t in corpus]
        ref = BatchedGenerator(ta.xmem_params, ta.sam_params, ta.cfg).run(
            videos, tpls)
        got = BatchedGenerator(ta.xmem_params, ta.sam_params, ta.cfg,
                               chunk=2).run(videos, tpls)
        for vi, (frames, _) in enumerate(corpus):
            assert len(got[vi]["masks"]) == len(frames)
            for t in range(len(frames)):
                np.testing.assert_array_equal(
                    got[vi]["masks"][t], ref[vi]["masks"][t],
                    err_msg=f"video {vi} frame {t}")
                np.testing.assert_allclose(
                    got[vi]["scores"][t], ref[vi]["scores"][t],
                    rtol=1e-5, atol=1e-6,
                    err_msg=f"video {vi} frame {t} scores")

    def test_resolution_mismatch_rejected(self):
        ta = fresh_ta(False)
        gen = BatchedGenerator(ta.xmem_params, ta.sam_params, ta.cfg)
        v0, t0 = _video(2, 1, label=1)
        bad = [np.zeros((H + 8, W, 3), np.uint8)] * 2
        with pytest.raises(ValueError, match="share"):
            gen.run([v0, bad], [t0, np.zeros((H + 8, W), np.uint8)])


def _make_lvos_layout(root, corpus):
    for vi, (frames, tpl) in enumerate(corpus):
        name = f"vid{vi}"
        img_dir = os.path.join(root, "JPEGImages", name)
        ann_dir = os.path.join(root, "Annotations", name)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i, f in enumerate(frames):
            Image.fromarray(f).save(os.path.join(img_dir, f"{i:05d}.jpg"))
        save_palette_mask(tpl, os.path.join(ann_dir, "00000.png"))


class TestBatchedRunner:
    def test_png_tree_matches_sequential(self, tmp_path, monkeypatch):
        """run_model_on_longvos_set(batched=...) emits the same file set with
        the same mask content as the sequential branch (JPEG round-trip makes
        the frames common to both paths, so equality is exact)."""
        ta = fresh_ta(False)
        corpus = _corpus()
        _make_lvos_layout(str(tmp_path / "lvos"), corpus)
        monkeypatch.chdir(tmp_path)
        ds = LongVideoDataset(str(tmp_path / "lvos"))

        class _Model:  # the runner's sequential branch surface
            xmem = ta.xmem

            @staticmethod
            def generator(frames, template):
                masks, scores = [], []
                for i, f in enumerate(frames):
                    m, _lg, _p, s = ta.xmem.track(
                        f, template if i == 0 else None)
                    masks.append(m)
                    scores.append(s)
                return masks, None, None, scores

        run_model_on_longvos_set("seq", _Model(), ds)
        gen = BatchedGenerator(ta.xmem_params, ta.sam_params, ta.cfg)
        run_model_on_longvos_set("bat", None, ds, batched=gen)

        seq_root = os.path.join("result", "seq", "masks")
        bat_root = os.path.join("result", "bat", "masks")
        seq_files = sorted(
            os.path.relpath(os.path.join(d, f), seq_root)
            for d, _, fs in os.walk(seq_root) for f in fs)
        bat_files = sorted(
            os.path.relpath(os.path.join(d, f), bat_root)
            for d, _, fs in os.walk(bat_root) for f in fs)
        assert seq_files == bat_files and len(seq_files) == sum(
            len(v) for v, _ in corpus)
        for rel in seq_files:
            np.testing.assert_array_equal(
                load_palette_mask(os.path.join(seq_root, rel)),
                load_palette_mask(os.path.join(bat_root, rel)),
                err_msg=rel)
