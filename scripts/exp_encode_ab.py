"""Standalone timer for the batched SAM encode at the exact bench shape
(K=8 vmapped vit_h rect encode, bf16). For same-session A/B of encoder
changes: run, flip the code (git stash / env knob), run again.

Run: python scripts/exp_encode_ab.py [reps=5]
Env: BENCH_WIN_IMPL / BENCH_FLASH / BENCH_RECT honored like bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vosesam_tpu.config import SAMConfig
    from vosesam_tpu.models.sam import predictor

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    K = 8
    cfg = SAMConfig(
        model_type=os.environ.get("BENCH_SAM", "vit_h"), hq=True,
        use_flash_attention=os.environ.get("BENCH_FLASH", "1") == "1",
        windowed_attention_impl=os.environ.get("BENCH_WIN_IMPL",
                                               "xla_fused_bias"),
        encode_rect=os.environ.get("BENCH_RECT", "1") == "1",
    )
    params = predictor.sam_init(jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16)
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (K, 480, 854, 3), np.uint8))

    @jax.jit
    def enc(p, fb):
        return jax.vmap(lambda f: predictor.encode_image(p, f, cfg).embedding)(fb)

    out = enc(params, frames)
    np.asarray(out.ravel()[0:1])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = enc(params, frames)
        np.asarray(out.ravel()[0:1])
        best = min(best, time.perf_counter() - t0)
    print(f"encode: {best / K * 1e3:.2f} ms/frame (best of {reps}, K={K}, "
          f"impl={cfg.windowed_attention_impl}, flash={cfg.use_flash_attention})",
          flush=True)


if __name__ == "__main__":
    main()
