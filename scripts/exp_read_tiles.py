"""Tile sweep for the shared-validity fused memory read.

VERDICT r2 noted an ~2 ms occupancy-INDEPENDENT floor in the fused read
(grid/pipeline overhead, BASELINE.md gen-5 ledger). The (q_tile, m_tile)
defaults (416, 512) were chosen at O=3; at the production O=2 shape the
VMEM budget allows larger tiles — fewer grid steps, less per-tile pipeline
overhead. Device-loop timing (see exp_read_scan.py for why per-dispatch
timing lies on this tunnel).

Run: python scripts/exp_read_tiles.py  (one TPU process at a time)
Env: TILE_LIVE (live_end fraction of M, default 1.0), READ_K (default 30)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.ops.pallas.memory_read import fused_memory_read_shared

    O, Q, M, CK, CV = 2, 1620, 17200, 64, 512
    K = int(os.environ.get("READ_K", "30"))
    frac = float(os.environ.get("TILE_LIVE", "1.0"))
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    mk = jax.random.normal(ks[0], (M, CK), jnp.bfloat16)
    ms = 1.0 + jax.nn.softplus(jax.random.normal(ks[1], (M,))).astype(jnp.float32)
    mv = jax.random.normal(ks[2], (O, M, CV), jnp.bfloat16)
    qk = jax.random.normal(ks[3], (Q, CK), jnp.bfloat16)
    qe = jax.nn.sigmoid(jax.random.normal(ks[4], (Q, CK))).astype(jnp.bfloat16)
    kv = jnp.ones((M,), bool)
    le = jnp.int32(int(M * frac))
    N = 20

    ref = None
    for q_tile, m_tile in [(416, 512), (416, 1024), (416, 2048),
                           (832, 512), (832, 1024), (1664, 512),
                           (1664, 1024), (208, 512), (416, 256)]:
        @jax.jit
        def run(qk, _qt=q_tile, _mt=m_tile):
            def step(carry, _):
                o, _u = fused_memory_read_shared(
                    mk, ms, qk + carry.astype(qk.dtype) * 0, qe, mv, kv, K,
                    return_usage=True, live_end=le, q_tile=_qt, m_tile=_mt)
                return carry + jnp.float32(
                    jnp.sum(o.astype(jnp.float32))) * 1e-30, 0
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c

        try:
            out = np.asarray(run(qk))
        except Exception as e:
            print(f"q_tile={q_tile:5d} m_tile={m_tile:5d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        if ref is None:
            ref = out
        t0 = time.perf_counter()
        np.asarray(run(qk))
        dt = (time.perf_counter() - t0) / N * 1e3
        match = "" if abs(float(out) - float(ref)) < 1e-6 else "  MISMATCH"
        print(f"q_tile={q_tile:5d} m_tile={m_tile:5d} live={frac:g}: "
              f"{dt:7.2f} ms/read{match}", flush=True)


if __name__ == "__main__":
    main()
