"""A/B: ViT patch embed as conv vs exact space-to-depth matmul.

The round-2 ResNet stem finding (BASELINE.md): XLA:TPU ran the C_in=3
7x7/s2 conv at 0.37 TFLOPS. The SAM patch embed is also C_in=3 (16x16/s16,
image_encoder.py:318) — but non-overlapping, so it *should* lower to a
reshape+matmul. Verify instead of assuming: device-loop both forms at the
rect-encode shape (576x1024x3 -> 36x64x1280).

Run: python scripts/exp_patch_embed.py  (one TPU process at a time)
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

    H, W, P, D = 576, 1024, 16, 1280
    K = 8  # chunk batch
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(r[0], (K, H, W, 3), jnp.bfloat16)
    wconv = jax.random.normal(r[1], (P, P, 3, D), jnp.bfloat16) * 0.02
    b = jax.random.normal(r[2], (D,), jnp.bfloat16) * 0.02
    N = 30

    def conv_form(x):
        return jax.lax.conv_general_dilated(
            x, wconv, (P, P), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    wmat = wconv.reshape(P * P * 3, D)

    def s2d_form(x):
        k, h, w, c = x.shape
        t = x.reshape(k, h // P, P, w // P, P, c)
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(k, h // P, w // P, P * P * c)
        return t @ wmat + b

    def dev_loop(body):
        @jax.jit
        def run(x):
            def step(carry, _):
                y = body(x + carry.astype(x.dtype) * 0)
                return carry + jnp.float32(
                    jnp.sum(y.astype(jnp.float32))) * 1e-30, 0
            c, _ = jax.lax.scan(step, jnp.float32(0), None, length=N)
            return c
        out = np.asarray(run(x))
        t0 = time.perf_counter()
        np.asarray(run(x))
        return (time.perf_counter() - t0) / N / K * 1e3, out

    ms_c, out_c = dev_loop(conv_form)
    ms_s, out_s = dev_loop(s2d_form)
    print(f"conv form: {ms_c:7.3f} ms/frame   s2d-matmul: {ms_s:7.3f} ms/frame"
          f"   checksum d={abs(float(out_c) - float(out_s)):.2e}", flush=True)

    y1 = np.asarray(jax.jit(conv_form)(x), np.float32)
    y2 = np.asarray(jax.jit(s2d_form)(x), np.float32)
    print(f"max |conv - s2d| = {np.abs(y1 - y2).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
