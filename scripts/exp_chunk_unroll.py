"""A/B: the chunked XMem drivers — fused (one-jit lax.scan), pipelined
(per-frame jit dispatches), and the raw per-frame tracker loop.

Findings on the tunneled v5e (2026-08-17, XMem-only at 480p, K=8):
    fused scan           22.1 ms/frame   (scan unroll=K was WORSE: 25.4)
    per-frame jits       15.8 ms/frame
The while-loop carry blocks in-place arena updates and the loop prevents
cross-step scheduling; dispatch pipelining makes the extra per-frame
dispatches free. This is why inference/chunked.py's default track_chunk is
the pipelined host driver, with track_chunk_fused kept for use inside an
outer traced program.

Run ON THE CHIP (one TPU process at a time):
    PYTHONPATH=.:$PYTHONPATH python scripts/exp_chunk_unroll.py [K] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vosesam_tpu.config import FrameworkConfig, RefinementConfig, XMemConfig
    from vosesam_tpu.inference import core, tracker
    from vosesam_tpu.inference.chunked import track_chunk, track_chunk_fused
    from vosesam_tpu.models.xmem import network as xnet

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    h, w = 480, 854
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    frames = np.empty((k, h, w, 3), np.uint8)
    for i in range(k):
        f = base.copy()
        f[100 + 2 * i:320 + 2 * i, 150 + 5 * i:500 + 5 * i] = (220, 60, 60)
        frames[i] = f
    fbatch = jnp.asarray(frames)

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        refinement=RefinementConfig(use_refinement=False),
        dtype="bfloat16",
    )

    def setup():
        params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem, dtype=jnp.bfloat16)
        state = core.init_tracker_state(cfg, (h, w))
        mask = jnp.zeros((3, h, w)).at[0, 100:320, 150:500].set(1.0)
        mask = mask.at[1, 50:150, 600:750].set(1.0)
        state, *_ = tracker.track_first_frame(
            params, state, fbatch[0], mask, jnp.array([True, True, False]),
            cfg, paint=False)
        return params, state

    for name, fn in (("fused scan", track_chunk_fused),
                     ("pipelined ", track_chunk)):
        params, st = setup()
        t0 = time.perf_counter()
        st, idx, _ = fn(params, None, st, fbatch, cfg)
        np.asarray(idx).ravel()[:1]
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            st, idx, _ = fn(params, None, st, fbatch, cfg)
        np.asarray(idx).ravel()[:1]
        ms = (time.perf_counter() - t0) / (reps * k) * 1e3
        print(f"{name}: {ms:6.1f} ms/frame (first-call {compile_s:.0f}s)",
              flush=True)

    params, st = setup()
    st, idx, *_ = tracker.track_frame(params, None, st, fbatch[0], cfg, paint=False)
    np.asarray(idx).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        for i in range(k):
            st, idx, *_ = tracker.track_frame(params, None, st, fbatch[i], cfg,
                                              paint=False)
    np.asarray(idx).ravel()[:1]
    ms = (time.perf_counter() - t0) / (reps * k) * 1e3
    print(f"per-frame  : {ms:6.1f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
