"""Memory hierarchy tests: ring writes, reads, consolidation, LFU eviction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import MemoryConfig, XMemConfig
from vosesam_tpu.memory import manager, rings

H16, W16 = 4, 6
HW = H16 * W16


@pytest.fixture
def cfgs():
    mem = MemoryConfig(
        max_mid_term_frames=3, min_mid_term_frames=2,
        max_long_term_elements=64, num_prototypes=8, top_k=4, mem_every=2,
    )
    xm = XMemConfig(key_dim=8, value_dim=16, hidden_dim=4, max_objects=3)
    return mem, xm


def mk_frame(seed, o=3):
    r = np.random.default_rng(seed)
    key = jnp.array(r.normal(size=(H16, W16, 8)), jnp.float32)
    shr = jnp.array(1 + r.random((H16, W16, 1)), jnp.float32)
    sel = jnp.array(r.random((H16, W16, 8)), jnp.float32)
    val = jnp.array(r.normal(size=(o, H16, W16, 16)), jnp.float32)
    return key, shr, sel, val


class TestAddAndRead:
    def test_add_appends(self, cfgs):
        mem, xm = cfgs
        st = rings.init_memory(mem, xm, (H16, W16))
        key, shr, sel, val = mk_frame(0)
        ov = jnp.array([True, True, False])
        st = manager.add_memory(st, key, shr, sel, val, ov, mem, HW)
        assert int(st.work.count) == HW
        assert bool(st.work.value_valid[0, 0]) and not bool(st.work.value_valid[2, 0])
        np.testing.assert_allclose(
            np.asarray(st.work.keys[:HW]), np.asarray(key).reshape(HW, 8)
        )

    def test_read_prefers_matching_key(self, cfgs):
        mem, xm = cfgs
        st = rings.init_memory(mem, xm, (H16, W16))
        key, shr, sel, val = mk_frame(1)
        ov = jnp.array([True, False, False])
        st = manager.add_memory(st, key, shr, sel, val, ov, mem, HW)
        # query with the stored keys: readout should approximate stored values
        readout, st2 = manager.match_memory(st, key, sel, mem)
        assert readout.shape == (3, H16, W16, 16)
        # objects without memory must read zero
        assert np.all(np.asarray(readout[1]) == 0)
        assert np.all(np.asarray(readout[2]) == 0)
        # usage must have been recorded on live work slots
        assert float(jnp.sum(st2.work.use_count[:HW])) > 0
        assert float(jnp.sum(st2.work.use_count[HW:])) == 0

    def test_late_object_extent(self, cfgs):
        mem, xm = cfgs
        st = rings.init_memory(mem, xm, (H16, W16))
        key, shr, sel, val = mk_frame(2)
        st = manager.add_memory(st, key, shr, sel, val, jnp.array([True, False, False]), mem, HW)
        key2, shr2, sel2, val2 = mk_frame(3)
        st = manager.add_memory(st, key2, shr2, sel2, val2, jnp.array([True, True, False]), mem, HW)
        vv = np.asarray(st.work.value_valid)
        assert vv[0, :2 * HW].all()
        assert not vv[1, :HW].any() and vv[1, HW:2 * HW].all()  # object 1 joined late


class TestConsolidation:
    def run_until_full(self, mem, xm, frames):
        st = rings.init_memory(mem, xm, (H16, W16))
        ov = jnp.array([True, True, False])
        for i in range(frames):
            key, shr, sel, val = mk_frame(10 + i)
            # a read in between records usage (needed by consolidation)
            if i > 0:
                _, st = manager.match_memory(st, key, sel, mem)
            st = manager.add_memory(st, key, shr, sel, val, ov, mem, HW)
        return st

    def test_triggers_at_capacity(self, cfgs):
        mem, xm = cfgs
        # capacity = 3 frames; adding 3rd triggers consolidation back to 2 frames
        st = self.run_until_full(mem, xm, 3)
        assert int(st.work.count) == mem.min_mid_term_frames * HW
        assert int(jnp.sum(st.long.key_valid)) == mem.num_prototypes
        # frame-0 keys stay put
        key0 = mk_frame(10)[0]
        np.testing.assert_allclose(
            np.asarray(st.work.keys[:HW]), np.asarray(key0).reshape(HW, 8)
        )
        # tail slots hold the most recent frame
        key2 = mk_frame(12)[0]
        np.testing.assert_allclose(
            np.asarray(st.work.keys[HW:2 * HW]), np.asarray(key2).reshape(HW, 8)
        )

    def test_lt_values_masked_for_missing_objects(self, cfgs):
        mem, xm = cfgs
        st = self.run_until_full(mem, xm, 3)
        vv = np.asarray(st.long.value_valid)
        assert vv[0].sum() == mem.num_prototypes  # object 0 valid everywhere
        assert vv[2].sum() == 0                   # absent object has no LT values

    def test_read_after_consolidation(self, cfgs):
        mem, xm = cfgs
        st = self.run_until_full(mem, xm, 3)
        q, _, sel, _ = mk_frame(42)
        readout, st2 = manager.match_memory(st, q, sel, mem)
        assert np.isfinite(np.asarray(readout)).all()
        # LT usage recorded when enabled
        assert float(jnp.sum(st2.long.use_count)) >= 0

    def test_jit_add_read_loop(self, cfgs):
        mem, xm = cfgs

        @jax.jit
        def step(st, seed):
            key = jax.random.normal(jax.random.PRNGKey(seed), (H16, W16, 8))
            sel = jax.nn.sigmoid(key)
            shr = jnp.ones((H16, W16, 1))
            val = jax.random.normal(jax.random.PRNGKey(seed + 1), (3, H16, W16, 16))
            readout, st = manager.match_memory(st, key, sel, mem)
            st = manager.add_memory(st, key, shr, sel, val,
                                    jnp.array([True, True, False]), mem, HW)
            return st, readout

        st = rings.init_memory(mem, xm, (H16, W16))
        for i in range(7):  # several consolidations under jit
            st, readout = step(st, i)
        assert np.isfinite(np.asarray(readout)).all()
        assert int(st.work.count) <= st.work.capacity
        assert int(jnp.sum(st.long.key_valid)) >= mem.num_prototypes


class TestLTDisabled:
    def test_drop_oldest(self, cfgs):
        mem, xm = cfgs
        mem = MemoryConfig(
            max_mid_term_frames=3, min_mid_term_frames=2,
            enable_long_term=False, top_k=4,
        )
        st = rings.init_memory(mem, xm, (H16, W16))
        ov = jnp.array([True, False, False])
        keys = []
        for i in range(4):
            key, shr, sel, val = mk_frame(20 + i)
            keys.append(np.asarray(key).reshape(HW, 8))
            st = manager.add_memory(st, key, shr, sel, val, ov, mem, HW)
        # capacity 3 frames: frame 0 kept, oldest middle dropped
        np.testing.assert_allclose(np.asarray(st.work.keys[:HW]), keys[0])
        np.testing.assert_allclose(np.asarray(st.work.keys[HW:2 * HW]), keys[2])
        np.testing.assert_allclose(np.asarray(st.work.keys[2 * HW:3 * HW]), keys[3])


class TestLiveObjectsHint:
    def test_hint_equivalence(self, cfgs):
        """MemoryConfig.live_objects must be output-invariant: reads with the
        hint (sliced arenas + shared-validity kernel) equal reads without it
        (full arenas + per-object kernel), including usage recording."""
        import dataclasses

        mem, xm = cfgs
        st = rings.init_memory(mem, xm, (H16, W16))
        ov = jnp.array([True, True, False])
        for seed in range(3):
            key, shr, sel, val = mk_frame(seed)
            st = manager.add_memory(st, key, shr, sel, val, ov, mem, HW)
        q, _, sel, _ = mk_frame(9)
        mem_hint = dataclasses.replace(mem, live_objects=2)
        ro_a, st_a = manager.match_memory(st, q, sel, mem)
        ro_b, st_b = manager.match_memory(st, q, sel, mem_hint)
        np.testing.assert_allclose(np.asarray(ro_a), np.asarray(ro_b),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_a.work.use_count),
                                   np.asarray(st_b.work.use_count),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_a.long.use_count),
                                   np.asarray(st_b.long.use_count),
                                   atol=1e-5, rtol=1e-5)

    def test_hint_empty_memory(self, cfgs):
        import dataclasses

        mem, xm = cfgs
        st = rings.init_memory(mem, xm, (H16, W16))
        q, _, sel, _ = mk_frame(4)
        mem_hint = dataclasses.replace(mem, live_objects=2)
        ro, _ = manager.match_memory(st, q, sel, mem_hint)
        assert np.isfinite(np.asarray(ro)).all()
        np.testing.assert_array_equal(np.asarray(ro), 0.0)
