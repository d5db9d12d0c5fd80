"""Rectangular SAM encode (SAMConfig.encode_rect): exactness of what must be
exact, bounded divergence of what is approximate, full-pipeline integration.

The rect encode (576x1024 model input for 480p instead of the official
1024x1024 square — segment_anything ResizeLongestSide pads to square,
consumed at tools/base_segmenter.py:31-40) drops the ~44% pad tokens from
the ViT. Exact invariants: the rect model input IS the top-left crop of the
square input; pos-embed / rel-pos tables are center/top-left crops of the
trained tables; point PE stays consistent with the dense grid PE. The
attention itself diverges (pad tokens no longer compete in softmax) — the
embedding-similarity and rollout tests bound that divergence on synthetic
data."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_pipeline import TINY_SAM, H, W, synthetic_video, template, tiny_cfg
from vosesam_tpu.config import FrameworkConfig, RefinementConfig
from vosesam_tpu.models.sam import image_encoder, predictor, prompt_encoder


RECT_SAM = dataclasses.replace(TINY_SAM, encode_rect=True)


@pytest.fixture(scope="module")
def sam_params():
    return predictor.sam_init(jax.random.PRNGKey(3), RECT_SAM)


def _frame():
    return jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (H, W, 3), np.uint8))


def test_rect_input_is_topleft_crop_of_square():
    f = _frame()
    sq, sq_hw = predictor.preprocess(f, TINY_SAM)
    rc, rc_hw = predictor.preprocess(f, RECT_SAM)
    assert sq_hw == rc_hw
    # 48x64 frame -> content (96, 128); rect pads H to 96, square to 128
    assert rc.shape[:2] == (96, 128)
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(sq[:96, :128]))


def test_rect_embedding_grid_and_shapes(sam_params):
    emb = predictor.encode_image(sam_params, _frame(), RECT_SAM)
    assert emb.embedding.shape == (6, 8, 256)     # 96/16 x 128/16
    pred = predictor.predict(
        sam_params, emb,
        jnp.asarray([[20.0, 20.0]]), jnp.asarray([1], jnp.int32), None,
        RECT_SAM,
    )
    assert pred.logits_full.shape[-2:] == (H, W)
    assert pred.low_res.shape[-2:] == (24, 32)    # model_input / 4
    assert np.isfinite(np.asarray(pred.logits_full)).all()


def test_rel_pos_center_crop_exact():
    table = jnp.arange(15, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
    # q=k=6 -> offsets -5..5 -> gather from the center 11 of the 15-entry
    # table (trained for the square grid of 8): identical to feeding the
    # center crop as a right-sized table.
    got = image_encoder._get_rel_pos(6, 6, table)
    want = image_encoder._get_rel_pos(6, 6, table[2:13])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # offset d appears at got[q, k] with d = q - k; spot-check trained values
    np.testing.assert_array_equal(np.asarray(got[5, 0]),
                                  np.asarray(table[2 + 10]))
    np.testing.assert_array_equal(np.asarray(got[0, 5]), np.asarray(table[2]))


def test_point_pe_matches_dense_grid_pe(sam_params):
    """A point at the center of grid cell (i, j) must encode to the same
    Fourier features as dense_pe[i, j] — the consistency that makes prompts
    land on the right embedding cells (holds in both square and rect)."""
    pp = sam_params.prompt_encoder
    for cfg, input_hw, grid in ((TINY_SAM, (128, 128), (8, 8)),
                                (RECT_SAM, (96, 128), (6, 8))):
        dense = prompt_encoder.dense_pe(pp, grid)
        i, j = 2, 5
        # model-input coords of the cell center (xy), half-pixel convention
        pt = jnp.asarray([[(j + 0.5) * 16 - 0.5, (i + 0.5) * 16 - 0.5]])
        pe = prompt_encoder._pe_encode(
            (pt + 0.5) / jnp.asarray([input_hw[1], input_hw[0]], jnp.float32),
            pp["pe_layer"]["positional_encoding_gaussian_matrix"])
        np.testing.assert_allclose(
            np.asarray(pe[0]), np.asarray(dense[i, j]), rtol=0, atol=1e-5)


def test_rect_square_embedding_similarity(sam_params):
    """The rect embedding approximates the content region of the square
    embedding; with random weights the divergence comes only from pad-token
    softmax competition + LN statistics. Bound it."""
    f = _frame()
    emb_sq = predictor.encode_image(sam_params, f, TINY_SAM)
    emb_rc = predictor.encode_image(sam_params, f, RECT_SAM)
    a = np.asarray(emb_sq.embedding[:6, :8]).reshape(-1, 256)
    b = np.asarray(emb_rc.embedding).reshape(-1, 256)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8)
    assert cos.mean() > 0.8, cos.mean()


def test_rect_chunked_matches_per_frame():
    """The headline path (chunked scan + batched SAM) stays bit-equal to
    per-frame stepping under the rect encode (the production bench config
    combines both)."""
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.chunked import track_chunk
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    cfg = tiny_cfg(True)
    cfg = dataclasses.replace(
        cfg, sam=dataclasses.replace(TINY_SAM, encode_rect=True))
    ta = TrackingAnything(cfg=cfg)
    frames = synthetic_video(5)
    mask = np.zeros((2, H, W), np.float32)
    mask[0, 10:24, 10:30] = 1.0
    st = core.init_tracker_state(cfg, (H, W))
    st, *_ = core.step_with_mask(
        ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask),
        jnp.asarray([True, False]), cfg)

    st_ref = st
    ref = []
    for fr in frames[1:]:
        st_ref, indexed, *_ = tracker.track_frame(
            ta.xmem_params, ta.sam_params, st_ref, jnp.asarray(fr), cfg,
            paint=False)
        ref.append(np.asarray(indexed))

    st_c, idx_c, _sc = track_chunk(
        ta.xmem_params, ta.sam_params, st,
        jnp.stack([jnp.asarray(f) for f in frames[1:]]), cfg)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(idx_c[i]), ref[i])


@pytest.mark.slow
def test_rect_rollout_tracks_like_square():
    """Synthetic moving-object rollout: rect-encode refinement masks stay
    close to square-encode masks (same random weights, same video).
    Slow-marked: two full refinement rollouts (~40 s on the 1-core host);
    the quick gate keeps the exactness/shape/chunked rect tests above."""
    from vosesam_tpu.inference import core, tracker

    ious = {}
    for name, rect in (("square", False), ("rect", True)):
        cfg = tiny_cfg(True)
        cfg = dataclasses.replace(
            cfg, sam=dataclasses.replace(TINY_SAM, encode_rect=rect),
            refinement=dataclasses.replace(cfg.refinement, optimized=False),
        )
        from vosesam_tpu.pipeline.track_anything import TrackingAnything

        ta = TrackingAnything(cfg=cfg)
        frames = synthetic_video(4)
        mask = np.zeros((2, H, W), np.float32)
        mask[0, 10:24, 10:30] = 1.0
        st = core.init_tracker_state(cfg, (H, W))
        st, *_ = core.step_with_mask(
            ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask),
            jnp.asarray([True, False]), cfg)
        out = []
        for fr in frames[1:]:
            st, indexed, _lg, _sc, _p = tracker.track_frame(
                ta.xmem_params, ta.sam_params, st, jnp.asarray(fr), cfg,
                paint=False)
            out.append(np.asarray(indexed))
        ious[name] = out

    for a, b in zip(ious["square"], ious["rect"]):
        inter = ((a == 1) & (b == 1)).sum()
        union = ((a == 1) | (b == 1)).sum()
        if union > 0:
            assert inter / union > 0.6, (inter, union)


# ------------------------------------------------- fixed-size distorted mode

FIXED_SAM = dataclasses.replace(TINY_SAM, encode_fixed_hw=(96, 128))


def test_fixed_hw_encode_shapes_and_predict():
    """encode_fixed_hw: the frame stretches over the whole model input (no
    padding), the grid tiles exactly, and prediction round-trips to the
    original resolution."""
    params = predictor.sam_init(jax.random.PRNGKey(5), FIXED_SAM)
    f = _frame()
    x, input_hw = predictor.preprocess(f, FIXED_SAM)
    assert x.shape[:2] == (96, 128) and input_hw == (96, 128)
    emb = predictor.encode_image(params, f, FIXED_SAM)
    assert emb.embedding.shape == (6, 8, 256)
    pred = predictor.predict(
        params, emb, jnp.asarray([[32.0, 24.0]]), jnp.asarray([1], jnp.int32),
        None, FIXED_SAM)
    assert pred.logits_full.shape[-2:] == (H, W)
    assert np.isfinite(np.asarray(pred.logits_full)).all()


def test_fixed_hw_coords_stretch_per_axis():
    """A point at the original-image center must land at the model-input
    center under the per-axis stretch."""
    c = predictor.transform_coords(
        jnp.asarray([[W / 2.0, H / 2.0]]), (H, W), FIXED_SAM)
    np.testing.assert_allclose(np.asarray(c[0]), [128 / 2.0, 96 / 2.0],
                               atol=1e-5)


# ------------------------------------------------- fixed-size letterbox mode

LB_SAM = dataclasses.replace(TINY_SAM, encode_letterbox_hw=(64, 128))


def test_letterbox_full_grid_equals_official_square():
    """Letterbox to the official (S, S) square IS the official square path —
    same longest-fit scale, same top-left placement, same pad. Bit-equal."""
    lb = dataclasses.replace(TINY_SAM, encode_letterbox_hw=(128, 128))
    f = _frame()
    sq, sq_hw = predictor.preprocess(f, TINY_SAM)
    lx, lb_hw = predictor.preprocess(f, lb)
    assert sq_hw == lb_hw
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(sq))
    c_sq = predictor.transform_coords(jnp.asarray([[20.0, 10.0]]), (H, W), TINY_SAM)
    c_lb = predictor.transform_coords(jnp.asarray([[20.0, 10.0]]), (H, W), lb)
    np.testing.assert_allclose(np.asarray(c_sq), np.asarray(c_lb))


def test_letterbox_preserves_aspect_and_pads():
    """(48, 64) frame into a (64, 128) grid: longest-fit scale is 64/48 =
    4/3 (aspect preserved on BOTH axes, unlike encode_fixed_hw), content
    (64, 85) top-left, the rest zero pad."""
    f = _frame()
    x, input_hw = predictor.preprocess(f, LB_SAM)
    assert x.shape[:2] == (64, 128)
    assert input_hw == (64, 85)
    np.testing.assert_array_equal(np.asarray(x[:, 85:]), 0.0)
    # original center maps to per-axis SAME scale (geometry-true)
    c = predictor.transform_coords(jnp.asarray([[W / 2.0, H / 2.0]]), (H, W), LB_SAM)
    np.testing.assert_allclose(np.asarray(c[0]), [W / 2 * 4 / 3, 32.0], atol=1e-5)


def test_letterbox_encode_and_predict_roundtrip():
    params = predictor.sam_init(jax.random.PRNGKey(7), LB_SAM)
    f = _frame()
    emb = predictor.encode_image(params, f, LB_SAM)
    assert emb.embedding.shape == (4, 8, 256)      # 64/16 x 128/16
    pred = predictor.predict(
        params, emb, jnp.asarray([[20.0, 20.0]]), jnp.asarray([1], jnp.int32),
        None, LB_SAM)
    assert pred.logits_full.shape[-2:] == (H, W)
    assert pred.low_res.shape[-2:] == (16, 32)     # model_input / 4
    assert np.isfinite(np.asarray(pred.logits_full)).all()


def test_letterbox_config_validation():
    with np.testing.assert_raises(ValueError):
        dataclasses.replace(
            TINY_SAM, encode_letterbox_hw=(64, 128), encode_fixed_hw=(64, 128))
    with np.testing.assert_raises(ValueError):
        dataclasses.replace(TINY_SAM, encode_letterbox_hw=(60, 128))


@pytest.mark.slow
def test_letterbox_rollout_tracks_like_square():
    """Synthetic moving-object rollout: letterbox-encode refinement masks
    stay close to square-encode masks (same random weights, same video) —
    the same gate the rect encode passed before becoming the bench default.
    The letterbox divergence is internal resolution only (64x128 grid vs
    the 128x128 square here)."""
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    outs = {}
    for name, sam_cfg in (("square", TINY_SAM), ("letterbox", LB_SAM)):
        cfg = tiny_cfg(True)
        cfg = dataclasses.replace(
            cfg, sam=sam_cfg,
            refinement=dataclasses.replace(cfg.refinement, optimized=False),
        )
        ta = TrackingAnything(cfg=cfg)
        frames = synthetic_video(4)
        mask = np.zeros((2, H, W), np.float32)
        mask[0, 10:24, 10:30] = 1.0
        st = core.init_tracker_state(cfg, (H, W))
        st, *_ = core.step_with_mask(
            ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask),
            jnp.asarray([True, False]), cfg)
        seq = []
        for fr in frames[1:]:
            st, indexed, _lg, _sc, _p = tracker.track_frame(
                ta.xmem_params, ta.sam_params, st, jnp.asarray(fr), cfg,
                paint=False)
            seq.append(np.asarray(indexed))
        outs[name] = seq

    for a, b in zip(outs["square"], outs["letterbox"]):
        inter = ((a == 1) & (b == 1)).sum()
        union = ((a == 1) | (b == 1)).sum()
        if union > 0:
            assert inter / union > 0.6, (inter, union)


def test_letterbox_tracker_frame_runs():
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    cfg = tiny_cfg(True)
    cfg = dataclasses.replace(cfg, sam=LB_SAM)
    ta = TrackingAnything(cfg=cfg)
    frames = synthetic_video(3)
    mask = np.zeros((2, H, W), np.float32)
    mask[0, 10:24, 10:30] = 1.0
    st = core.init_tracker_state(cfg, (H, W))
    st, *_ = core.step_with_mask(
        ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask),
        jnp.asarray([True, False]), cfg)
    st, indexed, *_ = tracker.track_frame(
        ta.xmem_params, ta.sam_params, st, jnp.asarray(frames[1]), cfg,
        paint=False)
    idx = np.asarray(indexed)
    assert idx.shape == (H, W)
    assert set(np.unique(idx)) <= {0, 1, 2}


def test_fixed_hw_tracker_frame_runs():
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    cfg = tiny_cfg(True)
    cfg = dataclasses.replace(cfg, sam=FIXED_SAM)
    ta = TrackingAnything(cfg=cfg)
    frames = synthetic_video(3)
    mask = np.zeros((2, H, W), np.float32)
    mask[0, 10:24, 10:30] = 1.0
    st = core.init_tracker_state(cfg, (H, W))
    st, *_ = core.step_with_mask(
        ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask),
        jnp.asarray([True, False]), cfg)
    st, indexed, *_ = tracker.track_frame(
        ta.xmem_params, ta.sam_params, st, jnp.asarray(frames[1]), cfg,
        paint=False)
    idx = np.asarray(indexed)
    assert idx.shape == (H, W)
    assert set(np.unique(idx)) <= {0, 1, 2}
