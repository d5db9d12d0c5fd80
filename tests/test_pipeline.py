"""Pipeline facade tests: generator loop, interact controller, full
XMem->SAM refinement frame (tiny models, random weights)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import (
    FrameworkConfig,
    MemoryConfig,
    RefinementConfig,
    SAMConfig,
    XMemConfig,
)
from vosesam_tpu.pipeline.track_anything import TrackingAnything, parse_augment

H, W = 48, 64

TINY_SAM = SAMConfig(
    model_type="vit_b", image_size=128, window_size=7,
    vit_dims=(("vit_b", 64, 2, 2, (1,)),),
)


def tiny_cfg(use_refinement: bool) -> FrameworkConfig:
    return FrameworkConfig(
        xmem=XMemConfig(max_objects=2),
        memory=MemoryConfig(
            max_mid_term_frames=3, min_mid_term_frames=2,
            max_long_term_elements=64, num_prototypes=8, top_k=8, mem_every=2,
        ),
        sam=TINY_SAM,
        refinement=RefinementConfig(
            use_refinement=use_refinement, mode="both_neg",
            min_region_area=10.0, optimized=True,
        ),
        dtype="float32",
    )


@functools.lru_cache(maxsize=None)
def _shared_ta(use_refinement: bool) -> TrackingAnything:
    return TrackingAnything(cfg=tiny_cfg(use_refinement))


def fresh_ta(use_refinement: bool) -> TrackingAnything:
    """Process-wide shared TrackingAnything for the two tiny_cfg configs,
    with tracker memory cleared. Constructing one costs seconds (param-init
    compiles + closure retraces); tests that only need a fresh memory share
    an instance instead."""
    ta = _shared_ta(use_refinement)
    ta.xmem.clear_memory()
    return ta


def synthetic_video(n=4):
    r = np.random.default_rng(0)
    base = r.integers(0, 255, (H, W, 3), np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        f[10 + i:24 + i, 10 + i:30 + i] = [255, 40, 40]
        frames.append(f)
    return frames


def template():
    m = np.zeros((H, W), np.uint8)
    m[10:24, 10:30] = 3   # non-contiguous palette label on purpose
    return m


class TestGenerator:
    def test_xmem_only(self):
        ta = fresh_ta(False)
        frames = synthetic_video(4)
        masks, logits, painted, scores = ta.generator(frames, template())
        assert len(masks) == 4
        # original palette label restored on output
        assert set(np.unique(masks[0])) <= {0, 3}
        assert (masks[0] == 3).sum() == (template() == 3).sum()
        assert painted[0].shape == (H, W, 3) and painted[0].dtype == np.uint8
        # scores are per LIVE object (reference base_tracker.py:163-165):
        # one object (label 3) -> one score, padded slots dropped
        assert len(scores[1]) == 1
        assert np.isfinite(scores[1]).all()

    def test_with_refinement(self):
        ta = fresh_ta(True)
        frames = synthetic_video(2)
        masks, logits, painted, scores = ta.generator(frames, template())
        assert len(masks) == 2
        assert masks[1].shape == (H, W)
        assert set(np.unique(masks[1])) <= {0, 3}

    def test_with_mask_mode_refinement(self):
        cfg = dataclasses.replace(
            tiny_cfg(True),
            refinement=RefinementConfig(
                use_refinement=True, mode="mask_bbox_pos_neg",
                min_region_area=10.0, optimized=False,
            ),
        )
        ta = TrackingAnything(cfg=cfg)
        frames = synthetic_video(2)
        masks, *_ = ta.generator(frames, template())
        assert masks[1].shape == (H, W)

    def test_clear_memory_between_videos(self):
        ta = fresh_ta(False)
        frames = synthetic_video(2)
        ta.generator(frames, template())
        ta.xmem.clear_memory()
        assert ta.xmem.state is None
        masks, *_ = ta.generator(frames, template())
        assert set(np.unique(masks[0])) <= {0, 3}


class TestInteract:
    def test_first_frame_click(self):
        ta = fresh_ta(True)
        img = synthetic_video(1)[0]
        pts = np.array([[20.0, 15.0]])
        lbl = np.array([1])
        mask, logit, painted = ta.first_frame_click(img, pts, lbl)
        assert mask.shape == (H, W) and mask.dtype == bool
        assert logit.shape == (32, 32)   # image_size/4 low-res grid
        assert painted.shape == (H, W, 3)

    def test_two_pass_with_negative(self):
        ta = fresh_ta(True)
        img = synthetic_video(1)[0]
        pts = np.array([[20.0, 15.0], [50.0, 40.0], [22.0, 16.0]])
        lbl = np.array([1, 0, 1])        # neg present, last positive
        mask, logit, painted = ta.first_frame_click(img, pts, lbl)
        assert mask.shape == (H, W)

    def test_click_pack_matches_official_one_pad(self):
        """The jitted click path must use the OFFICIAL predictor prompt
        pack — the raw clicks + exactly ONE (0,0,-1) pad (the convention
        the torch-oracle parity tests pin). Pad tokens are real decoder
        tokens, so pack size changes outputs: a fixed max_points pad
        measured ~40% mask divergence under random weights."""
        import jax.numpy as jnp

        from vosesam_tpu.models.sam import predictor

        ta = fresh_ta(True)
        img = synthetic_video(1)[0]
        sc = ta.samcontroler
        sc.set_image(img)
        pts = np.array([[20.0, 15.0], [40.0, 30.0]])
        lbl = np.array([1, 0])           # last click negative -> single pass
        mask, low, _ = sc.first_frame_click(img, pts, lbl)

        pts_off = np.concatenate([pts, [[0.0, 0.0]]], 0).astype(np.float32)
        lbl_off = np.concatenate([lbl, [-1]], 0).astype(np.int32)
        pred = predictor.predict(
            sc.params, sc.emb, jnp.asarray(pts_off),
            jnp.asarray(lbl_off), None, ta.cfg.sam)
        m_off, _, _, low_off = predictor.select_best(pred, ta.cfg.sam, True)
        # jit-vs-eager fusion can shift logits ~1 ulp; allow only
        # threshold-adjacent pixel flips, not a convention mismatch (the
        # rejected fixed-size pack diverged ~40% of pixels)
        mismatch = np.mean(mask != np.asarray(m_off))
        assert mismatch < 1e-3, f"mask mismatch fraction {mismatch}"
        np.testing.assert_allclose(low, np.asarray(low_off),
                                   rtol=1e-5, atol=1e-5)


def test_parse_augment_defaults(monkeypatch):
    monkeypatch.setattr("sys.argv", ["prog"])
    args = parse_augment()
    assert args.sam_model_type == "vit_h"
    assert args.port == 6080


class TestGeneratorChunked:
    @pytest.mark.parametrize("use_refinement", [False, True])
    def test_matches_per_frame(self, use_refinement):
        """Facade-level equivalence: chunked masks+scores == per-frame,
        including the label remap and the non-multiple-of-chunk tail."""
        frames = synthetic_video(6)   # 1 seed + 5 propagation (chunk 2 + tail)
        ta = fresh_ta(use_refinement)
        masks_ref, _, _, scores_ref = ta.generator(frames, template())

        ta = fresh_ta(use_refinement)
        masks_c, scores_c = ta.generator_chunked(frames, template(), chunk=2)

        assert len(masks_c) == len(masks_ref) == 6
        for a, b in zip(masks_ref, masks_c):
            np.testing.assert_array_equal(a, b)
        for sa, sb in zip(scores_ref, scores_c):
            np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-5)

    def test_painted_matches_per_frame(self):
        """generator_chunked(paint=True) — the app's track path — returns
        painted frames bit-identical to generator()'s (same jitted
        painter, one vmapped dispatch per chunk)."""
        frames = synthetic_video(6)
        ta = fresh_ta(False)
        _, _, painted_ref, _ = ta.generator(frames, template())
        ta = fresh_ta(False)
        masks_c, painted_c, scores_c = ta.generator_chunked(
            frames, template(), chunk=2, paint=True)
        assert len(painted_c) == len(painted_ref) == 6
        for i, (a, b) in enumerate(zip(painted_ref, painted_c)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"painted frame {i}")

    def test_requires_seeding(self):
        ta = fresh_ta(False)
        with pytest.raises(RuntimeError):
            ta.xmem.track_batch(synthetic_video(2))


class TestLiveObjectsHintBookkeeping:
    def test_upfront_registration_sets_hint(self):
        """All objects registered on frame 0 -> _track_cfg carries the
        live-object count; a mid-video annotation must drop it (the
        shared-validity read contract breaks, memory/manager.py)."""
        ta = fresh_ta(False)
        frames = synthetic_video(4)
        tr = ta.xmem
        tr.track(frames[0], template())
        assert tr._track_cfg().memory.live_objects == 1

        tr.track(frames[1])
        # mid-video add: second object annotated on frame 2
        tmpl2 = np.zeros((H, W), np.uint8)
        tmpl2[30:40, 40:60] = 5
        tr.track(frames[2], tmpl2)
        assert tr._track_cfg().memory.live_objects is None

        # tracking still works after the hint is dropped
        mask, *_ = tr.track(frames[3])
        assert set(np.unique(mask)) <= {0, 3, 5}

    def test_clear_restores_hint(self):
        ta = fresh_ta(False)
        frames = synthetic_video(2)
        tr = ta.xmem
        tr.track(frames[0], template())
        tr._mid_video_add = True
        ta.xmem.clear_memory()
        tr.track(frames[0], template())
        assert tr._track_cfg().memory.live_objects == 1
