"""Device-rate characterization behind BASELINE.md's platform model.

Two measurements:
 1. overlap: N independent dispatches of one 215-GFLOP bf16 matmul —
    separates the ~25 ms fixed tunnel round-trip latency from the marginal
    per-dispatch device time (~1.4 ms => ~150 TFLOPS marginal).
 2. chain: 32 DEPENDENT matmuls inside ONE executable — the sustained
    in-executable rate (~76.5 TFLOPS), bounding what a serial encoder can
    reach on this chip.

Run: python scripts/exp_dispatch_rates.py (one TPU process at a time)
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

    a = jax.random.normal(jax.random.PRNGKey(0), (16384, 1280), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (1280, 5120), jnp.bfloat16)
    f = jax.jit(lambda a, b: (a @ b).sum())
    f(a, b)
    np.asarray(f(a, b))
    flop = 2 * 16384 * 1280 * 5120
    for n in (1, 4, 8, 16):
        t0 = time.perf_counter()
        outs = [f(a, b) for _ in range(n)]
        np.asarray(outs[-1])
        dt = time.perf_counter() - t0
        print(f"overlap n={n:2d}: {dt * 1e3:7.2f} ms total, "
              f"{n * flop / dt / 1e12:6.1f} TFLOPS aggregate", flush=True)

    N, D, L = 4096, 1280, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16)
    ws = [jax.random.normal(jax.random.PRNGKey(i + 1), (D, D), jnp.bfloat16)
          * 0.02 for i in range(L)]

    @jax.jit
    def chain(x, ws):
        for w in ws:
            x = x @ w
        return x.sum()

    chain(x, ws)
    np.asarray(chain(x, ws))
    flop = 2 * N * D * D * L
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain(x, ws)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"dependent {L}-matmul chain: {dt * 1e3:.2f} ms/call, "
          f"{flop / dt / 1e12:.1f} TFLOPS inside one executable")


if __name__ == "__main__":
    main()
