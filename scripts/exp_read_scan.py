"""Memory-read impl A/B with dispatch latency amortized away.

tpu_verify.py times each read as its own dispatch (8 pipelined calls): on
this tunneled chip that folds ~25 ms fixed latency + pipeline effects into
the number, and produced contradictory orderings across runs (fused 31 ms
one day, 100 ms another). This benchmark scans N reads inside ONE jit so
the measured time is device compute only.

Run: python scripts/exp_read_scan.py  (one TPU process at a time)
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

    from vosesam_tpu.ops.memory_attention import read_memory_multiobject
    from vosesam_tpu.ops.pallas.memory_read import (
        fused_memory_read,
        fused_memory_read_shared,
    )

    O = int(os.environ.get("READ_O", "3"))
    Q, M, CK, CV = 1620, 17200, 64, 512
    K = int(os.environ.get("READ_K", "30"))
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 8)
    mk = jax.random.normal(ks[0], (M, CK), jnp.bfloat16)
    ms = 1.0 + jax.nn.softplus(jax.random.normal(ks[1], (M,))).astype(jnp.float32)
    mv = jax.random.normal(ks[2], (O, M, CV), jnp.bfloat16)
    qk = jax.random.normal(ks[3], (Q, CK), jnp.bfloat16)
    qe = jax.nn.sigmoid(jax.random.normal(ks[4], (Q, CK))).astype(jnp.bfloat16)
    kv = jnp.ones((M,), bool)
    vv = jnp.ones((O, M), bool)

    N = 20

    def scan_time(name, body):
        @jax.jit
        def run(qk):
            def step(carry, _):
                out = body(qk + carry.astype(qk.dtype) * 0)
                lead = jax.tree.leaves(out)[0]
                return carry + jnp.float32(jnp.sum(lead.astype(jnp.float32))) * 1e-30, 0
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c
        run(qk)
        np.asarray(run(qk))
        t0 = time.perf_counter()
        out = run(qk)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"{name}: {dt:7.2f} ms/read (deviceloop)", flush=True)
        return dt

    scan_time("xla exact   ", lambda q: read_memory_multiobject(
        mk, ms, mv, q, qe, kv, vv, K, return_usage=True))
    scan_time("fused       ", lambda q: fused_memory_read(
        mk, ms, q, qe, mv, kv[None] & vv, K, return_usage=True))
    scan_time("fused shared", lambda q: fused_memory_read_shared(
        mk, ms, q, qe, mv, kv, K, return_usage=True))
    # live_objects=2 production shape: 2 live rows sliced from a 3-row arena
    scan_time("shared O=2  ", lambda q: fused_memory_read_shared(
        mk, ms, q, qe, mv[:2], kv, K, return_usage=True))
    scan_time("xla approx  ", lambda q: read_memory_multiobject(
        mk, ms, mv, q, qe, kv, vv, K, return_usage=True, approx=True))

    # live_end occupancy sweep (O=2 production shape): how much of the
    # remaining cost scales with live tiles vs the fixed sim matmul +
    # (Q, M) HBM round-trip that still covers the full static capacity
    for frac in (1.0, 0.75, 0.5, 0.25):
        le = jnp.int32(int(M * frac))
        scan_time(f"shared O=2 live={frac:4.2f}",
                  lambda q, _le=le: fused_memory_read_shared(
                      mk, ms, q, qe, mv[:2], kv, K, return_usage=True,
                      live_end=_le))


if __name__ == "__main__":
    main()
