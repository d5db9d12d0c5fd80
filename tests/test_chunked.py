"""Chunked (frame-batched) tracking: equivalence with per-frame stepping."""

import jax.numpy as jnp
import numpy as np

from tests.test_pipeline import fresh_ta, tiny_cfg, synthetic_video, template, H, W
from vosesam_tpu.inference import core
from vosesam_tpu.inference.chunked import track_chunk, track_chunk_fused
from vosesam_tpu.inference.refinement import masks_from_prob


def test_chunk_matches_per_frame_xmem_only():
    cfg = tiny_cfg(False)
    ta = fresh_ta(False)
    frames = synthetic_video(5)
    mask = np.zeros((2, H, W), np.float32)
    mask[0, 10:24, 10:30] = 1.0
    valid = jnp.array([True, False])

    st = core.init_tracker_state(cfg, (H, W))
    st, *_ = core.step_with_mask(
        ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask), valid, cfg
    )
    # per-frame reference
    st_ref = st
    ref_idx = []
    for f in frames[1:]:
        st_ref, prob, _ = core.step(ta.xmem_params, st_ref, jnp.asarray(f), cfg)
        ref_idx.append(np.asarray(jnp.argmax(prob, 0)))

    # chunked
    st_chunk, indexed, scores = track_chunk(
        ta.xmem_params, None, st, jnp.stack([jnp.asarray(f) for f in frames[1:]]), cfg
    )
    assert indexed.shape == (4, H, W)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(indexed[i]), ref_idx[i])
    assert int(st_chunk.curr_ti) == int(st_ref.curr_ti)
    assert int(st_chunk.memory.work.count) == int(st_ref.memory.work.count)


def test_chunk_with_refinement_matches_per_frame():
    """The benched path: chunked+refinement masks AND scores must equal the
    per-frame track_frame outputs bit-for-bit (same ops, different batching
    — the SAM encode/refine is a pure per-frame function, chunked.py:1-16)."""
    from vosesam_tpu.inference import tracker as T

    cfg = tiny_cfg(True)
    ta = fresh_ta(True)
    frames = synthetic_video(5)
    mask = np.zeros((2, H, W), np.float32)
    mask[0, 10:24, 10:30] = 1.0
    valid = jnp.array([True, False])
    st = core.init_tracker_state(cfg, (H, W))
    st, *_ = core.step_with_mask(
        ta.xmem_params, st, jnp.asarray(frames[0]), jnp.asarray(mask),
        valid, cfg,
    )

    st_ref = st
    ref_idx, ref_scores = [], []
    for f in frames[1:]:
        st_ref, idx, _, sc, _ = T.track_frame(
            ta.xmem_params, ta.sam_params, st_ref, jnp.asarray(f), cfg,
            paint=False,
        )
        ref_idx.append(np.asarray(idx))
        ref_scores.append(np.asarray(sc))

    st_chunk, indexed, scores = track_chunk(
        ta.xmem_params, ta.sam_params, st,
        jnp.stack([jnp.asarray(f) for f in frames[1:]]), cfg,
    )
    assert indexed.shape == (4, H, W)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(indexed[i]), ref_idx[i])
        np.testing.assert_allclose(
            np.asarray(scores[i]), ref_scores[i], atol=1e-5, rtol=1e-5
        )
    assert int(st_chunk.curr_ti) == int(st_ref.curr_ti)

    # The fused one-jit driver (for use inside an outer traced program) must
    # produce the same masks/scores/state as the pipelined default.
    st_f, idx_f, sc_f = track_chunk_fused(
        ta.xmem_params, ta.sam_params, st,
        jnp.stack([jnp.asarray(f) for f in frames[1:]]), cfg,
    )
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(indexed))
    np.testing.assert_allclose(
        np.asarray(sc_f), np.asarray(scores), atol=1e-5, rtol=1e-5)
    assert int(st_f.curr_ti) == int(st_chunk.curr_ti)
    np.testing.assert_allclose(
        np.asarray(st_f.memory.work.keys), np.asarray(st_chunk.memory.work.keys),
        atol=1e-5, rtol=1e-5)
