"""End-to-end XMem propagation on a tiny synthetic video (random weights).

Verifies the jitted frame step machinery: state threading, mem-frame
scheduling, GT injection, consolidation under a realistic multi-frame loop.
With random weights masks are meaningless; we check mechanics + numerics
stay finite and distributions stay normalized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import FrameworkConfig, MemoryConfig, XMemConfig
from vosesam_tpu.inference import core
from vosesam_tpu.models.xmem import network as xnet

H, W = 48, 64


@pytest.fixture(scope="module")
def cfg():
    return FrameworkConfig(
        xmem=XMemConfig(max_objects=2),
        memory=MemoryConfig(
            max_mid_term_frames=3, min_mid_term_frames=2,
            max_long_term_elements=64, num_prototypes=8, top_k=8, mem_every=2,
        ),
        dtype="float32",
    )


@pytest.fixture(scope="module")
def params(cfg):
    return xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)


def synthetic_video(n=8):
    r = np.random.default_rng(0)
    base = r.integers(0, 255, (H, W, 3), np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        f[10 + i:20 + i, 10 + i:25 + i] = [255, 0, 0]  # moving box
        frames.append(f)
    return np.stack(frames)


def first_mask():
    m = np.zeros((2, H, W), np.float32)
    m[0, 10:20, 10:25] = 1.0
    return m


class TestStepLoop:
    def test_full_video(self, cfg, params):
        frames = synthetic_video(8)
        state = core.init_tracker_state(cfg, (H, W))
        mask = jnp.array(first_mask())
        mask_valid = jnp.array([True, False])

        state, prob, logits = core.step_with_mask(
            params, state, jnp.array(frames[0]), mask, mask_valid, cfg
        )
        assert prob.shape == (3, H, W)
        assert int(state.curr_ti) == 0
        assert int(state.memory.work.count) > 0          # frame 0 memorized
        # GT injection: prob follows the mask exactly on frame 0
        np.testing.assert_allclose(
            np.asarray(jnp.argmax(prob, 0) == 1), first_mask()[0] > 0.5
        )

        counts = []
        for i in range(1, 8):
            state, prob, logits = core.step(params, state, jnp.array(frames[i]), cfg)
            counts.append(int(state.memory.work.count))
            p = np.asarray(prob)
            assert np.isfinite(p).all()
            np.testing.assert_allclose(p.sum(0), 1.0, rtol=1e-4)
            # padded object 1 must never fire
            assert np.asarray(prob[2]).max() == 0

        assert int(state.curr_ti) == 7
        # mem_every=2: memory grew on schedule and consolidation kept it bounded
        assert max(counts) <= state.memory.work.capacity
        assert int(jnp.sum(state.memory.long.key_valid)) > 0  # consolidated

    def test_mem_every_schedule(self, cfg, params):
        frames = synthetic_video(4)
        state = core.init_tracker_state(cfg, (H, W))
        state, *_ = core.step_with_mask(
            params, state, jnp.array(frames[0]), jnp.array(first_mask()),
            jnp.array([True, False]), cfg,
        )
        c0 = int(state.memory.work.count)
        state, *_ = core.step(params, state, jnp.array(frames[1]), cfg)
        assert int(state.memory.work.count) == c0        # ti=1: not a mem frame
        state, *_ = core.step(params, state, jnp.array(frames[2]), cfg)
        assert int(state.memory.work.count) == 2 * c0    # ti=2: mem frame
        assert int(state.last_mem_ti) == 2

    def test_end_flag_skips_memory(self, cfg, params):
        frames = synthetic_video(3)
        state = core.init_tracker_state(cfg, (H, W))
        state, *_ = core.step_with_mask(
            params, state, jnp.array(frames[0]), jnp.array(first_mask()),
            jnp.array([True, False]), cfg,
        )
        c0 = int(state.memory.work.count)
        state, *_ = core.step(params, state, jnp.array(frames[1]), cfg)
        state, *_ = core.step(params, state, jnp.array(frames[2]), cfg, end=True)
        assert int(state.memory.work.count) == c0        # end frame not memorized

    def test_late_object_join(self, cfg, params):
        frames = synthetic_video(4)
        state = core.init_tracker_state(cfg, (H, W))
        state, *_ = core.step_with_mask(
            params, state, jnp.array(frames[0]), jnp.array(first_mask()),
            jnp.array([True, False]), cfg,
        )
        state, *_ = core.step(params, state, jnp.array(frames[1]), cfg)
        # object 1 joins at ti=2 via a correction mask
        m2 = np.zeros((2, H, W), np.float32)
        m2[1, 30:40, 40:55] = 1.0
        state, prob, _ = core.step_with_mask(
            params, state, jnp.array(frames[2]), jnp.array(m2),
            jnp.array([False, True]), cfg,
        )
        assert bool(state.memory.obj_valid[1])
        # the new object's mask is respected at the injection frame
        assert np.asarray(jnp.argmax(prob, 0))[35, 45] == 2
        state, prob, _ = core.step(params, state, jnp.array(frames[3]), cfg)
        assert np.isfinite(np.asarray(prob)).all()
