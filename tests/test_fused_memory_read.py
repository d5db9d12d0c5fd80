"""Fused Pallas memory-read kernel vs the XLA chain.

The kernel (ops/pallas/memory_read.py) must reproduce
ops/memory_attention.read_memory_multiobject — the reference semantics of
tracker/model/memory_util.py:7-80 — including the usage side-output, object
validity masking, and empty-memory behavior. CPU CI runs interpret mode; the
compiled-Mosaic check runs in scripts/tpu_verify.py on the real chip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.ops.memory_attention import read_memory_multiobject
from vosesam_tpu.ops.pallas.memory_read import fused_memory_read


def _mk_case(rng, o=3, m=300, q=100, ck=64, cv=96):
    mk = jnp.asarray(rng.standard_normal((m, ck)).astype(np.float32))
    ms = jnp.asarray(rng.uniform(1, 5, (m,)).astype(np.float32))
    qk = jnp.asarray(rng.standard_normal((q, ck)).astype(np.float32))
    qe = jnp.asarray(rng.uniform(0, 1, (q, ck)).astype(np.float32))
    mv = jnp.asarray(rng.standard_normal((o, m, cv)).astype(np.float32))
    kv = jnp.asarray(rng.uniform(0, 1, (m,)) > 0.2)
    vv = jnp.asarray(rng.uniform(0, 1, (o, m)) > 0.3) & kv[None]
    return mk, ms, qk, qe, mv, kv, vv


def test_fused_matches_xla(rng):
    mk, ms, qk, qe, mv, kv, vv = _mk_case(rng)
    vv = vv.at[2].set(False)  # one object without any memory
    ref_out, ref_use = read_memory_multiobject(
        mk, ms, mv, qk, qe, kv, vv, 12, return_usage=True
    )
    out, use = fused_memory_read(
        mk, ms, qk, qe, mv, kv[None] & vv, 12, return_usage=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(use), np.asarray(ref_use),
                               atol=1e-4, rtol=1e-4)


def test_fused_empty_memory(rng):
    """Frame-0 read: nothing valid -> zero readout, zero usage, no NaN."""
    mk, ms, qk, qe, mv, kv, vv = _mk_case(rng, o=2, m=64, q=32)
    none = jnp.zeros_like(vv)
    out, use = fused_memory_read(
        mk, ms, qk, qe, mv, none, 8, return_usage=True, interpret=True
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    np.testing.assert_array_equal(np.asarray(use), 0.0)


def test_fused_no_selection_no_shrinkage(rng):
    mk, ms, qk, qe, mv, kv, vv = _mk_case(rng, o=2, m=128, q=48)
    ref_out, _ = read_memory_multiobject(
        mk, None, mv, qk, None, kv, vv, 8, return_usage=False
    )
    out, _ = fused_memory_read(
        mk, None, qk, None, mv, kv[None] & vv, 8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)


def test_fused_multi_tile(rng):
    """M and Q crossing tile boundaries (multiple m-tiles, q-tiles)."""
    mk, ms, qk, qe, mv, kv, vv = _mk_case(rng, o=2, m=1100, q=200, cv=64)
    ref_out, ref_use = read_memory_multiobject(
        mk, ms, mv, qk, qe, kv, vv, 16, return_usage=True
    )
    out, use = fused_memory_read(
        mk, ms, qk, qe, mv, kv[None] & vv, 16, return_usage=True,
        q_tile=104, m_tile=512, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(use), np.asarray(ref_use),
                               atol=1e-4, rtol=1e-4)


def test_fused_bf16_inputs(rng):
    """bf16 keys/values with fp32 accumulation (the production dtype mix)."""
    mk, ms, qk, qe, mv, kv, vv = _mk_case(rng, o=2, m=256, q=64)
    ref_out, _ = read_memory_multiobject(
        mk.astype(jnp.bfloat16), ms, mv.astype(jnp.bfloat16),
        qk.astype(jnp.bfloat16), qe.astype(jnp.bfloat16), kv, vv, 8,
    )
    out, _ = fused_memory_read(
        mk.astype(jnp.bfloat16), ms, qk.astype(jnp.bfloat16),
        qe.astype(jnp.bfloat16), mv.astype(jnp.bfloat16),
        kv[None] & vv, 8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=5e-3, rtol=5e-3)


# ---------------------------------------------------------------------------
# Shared-validity variant (MemoryConfig.live_objects fast path)
# ---------------------------------------------------------------------------

from vosesam_tpu.ops.pallas.memory_read import fused_memory_read_shared


def _mk_shared_case(rng, o=3, m=300, q=100, ck=64, cv=96):
    mk, ms, qk, qe, mv, kv, _ = _mk_case(rng, o=o, m=m, q=q, ck=ck, cv=cv)
    shared = kv & jnp.asarray(rng.uniform(0, 1, (m,)) > 0.3)
    vv = jnp.broadcast_to(shared[None], (o, m))
    return mk, ms, qk, qe, mv, kv, vv, shared


def test_fused_shared_matches_per_object(rng):
    """Identical validity rows: the shared kernel must equal both the XLA
    chain and the per-object kernel (readout AND usage)."""
    mk, ms, qk, qe, mv, kv, vv, shared = _mk_shared_case(rng)
    ref_out, ref_use = read_memory_multiobject(
        mk, ms, mv, qk, qe, kv, vv, 12, return_usage=True
    )
    out, use = fused_memory_read_shared(
        mk, ms, qk, qe, mv, shared, 12, return_usage=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(use), np.asarray(ref_use),
                               atol=1e-4, rtol=1e-4)
    v1_out, v1_use = fused_memory_read(
        mk, ms, qk, qe, mv, kv[None] & vv, 12, return_usage=True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(v1_out),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(use), np.asarray(v1_use),
                               atol=1e-5, rtol=1e-5)


def test_fused_shared_multi_tile(rng):
    mk, ms, qk, qe, mv, kv, vv, shared = _mk_shared_case(
        rng, o=2, m=1100, q=200, cv=64)
    ref_out, ref_use = read_memory_multiobject(
        mk, ms, mv, qk, qe, kv, vv, 16, return_usage=True
    )
    out, use = fused_memory_read_shared(
        mk, ms, qk, qe, mv, shared, 16, return_usage=True,
        q_tile=104, m_tile=512, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(use), np.asarray(ref_use),
                               atol=1e-4, rtol=1e-4)


def test_fused_shared_empty_memory(rng):
    mk, ms, qk, qe, mv, kv, vv, _ = _mk_shared_case(rng, o=2, m=64, q=32)
    none = jnp.zeros((64,), bool)
    out, use = fused_memory_read_shared(
        mk, ms, qk, qe, mv, none, 8, return_usage=True, interpret=True
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    np.testing.assert_array_equal(np.asarray(use), 0.0)


def test_fused_shared_live_end_skip(rng):
    """live_end tile-skipping must be bit-identical to a full scan when all
    valid slots sit below live_end (the manager's concat-layout contract)."""
    o, m, q, cv = 2, 1600, 200, 64
    mk, ms, qk, qe, mv, kv, vv, shared = _mk_shared_case(
        rng, o=o, m=m, q=q, cv=cv)
    # prefix occupancy: only the first `live` slots may be valid
    live = 700
    prefix = shared & (jnp.arange(m) < live)
    full_out, full_use = fused_memory_read_shared(
        mk, ms, qk, qe, mv, prefix, 16, return_usage=True,
        q_tile=104, m_tile=512, interpret=True,
    )
    skip_out, skip_use = fused_memory_read_shared(
        mk, ms, qk, qe, mv, prefix, 16, return_usage=True,
        live_end=jnp.int32(live), q_tile=104, m_tile=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(skip_out), np.asarray(full_out))
    np.testing.assert_array_equal(np.asarray(skip_use), np.asarray(full_use))
    # and against the XLA chain
    ref_out, _ = read_memory_multiobject(
        mk, ms, mv, qk, qe, kv & (jnp.arange(m) < live),
        jnp.broadcast_to(prefix[None], (o, m)), 16, return_usage=True
    )
    np.testing.assert_allclose(np.asarray(skip_out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)


def test_fused_shared_live_end_zero(rng):
    """live_end=0 (empty arena) degenerates to the zero readout."""
    mk, ms, qk, qe, mv, kv, vv, _ = _mk_shared_case(rng, o=2, m=640, q=32)
    none = jnp.zeros((640,), bool)
    out, use = fused_memory_read_shared(
        mk, ms, qk, qe, mv, none, 8, return_usage=True,
        live_end=jnp.int32(0), interpret=True,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    np.testing.assert_array_equal(np.asarray(use), 0.0)
