"""Experiment: windowed-attention score-tensor dtype vs speed on the real chip.

Hypothesis (BASELINE.md: ~118 GB/s HBM on this tunneled chip): the XLA
windowed-attention path is bound by materializing the (nW, heads, 196, 196)
fp32 score tensor (~245 MB per block per frame at vit_h/480p->1024 input,
written + read = ~4 ms/block at 118 GB/s — matching the measured 3.44 ms).
If so, storing scores at 16-bit should nearly halve block time.

Precision note: the reference runs SAM in CUDA fp16 (tools/base_segmenter.py:24),
so fp16 scores match the reference's own numerics; fp32 is *extra* precision
our XLA path was paying bandwidth for.

Run: python scripts/exp_window_dtype.py [K]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(jax.tree.leaves(out)[-1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    k_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    heads, hd = 16, 80
    wsz = 14
    n_win = 25 * k_frames           # 5x14-window grid over 70x70 padded tokens
    t = wsz * wsz                   # 196
    c = heads * hd

    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i),
                                 (n_win, t, heads, hd), jnp.bfloat16)
               for i in range(3))
    bias_h = jax.random.normal(jax.random.fold_in(rng, 3),
                               (n_win, heads, t, wsz), jnp.float32)
    bias_w = jax.random.normal(jax.random.fold_in(rng, 4),
                               (n_win, heads, t, wsz), jnp.float32)

    def attn(score_dtype):
        @jax.jit
        def f(q, k, v, bh, bw):
            scale = 1.0 / np.sqrt(hd)
            s = jnp.einsum("bqnc,bknc->bnqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            s = s + (bh[..., :, None] + bw[..., None, :]).reshape(
                n_win, heads, t, t)
            s = s.astype(score_dtype)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
            return jnp.einsum("bnqk,bknc->bqnc", p, v)
        return f

    for name, dt in (("fp32", jnp.float32), ("fp16", jnp.float16),
                     ("bf16", jnp.bfloat16)):
        f = attn(dt)
        ms = timeit(lambda: f(q, k, v, bias_h, bias_w))
        print(f"K={k_frames} windowed scores {name}: {ms:7.2f} ms/block"
              f"  ({ms / k_frames:6.2f} ms/frame-block)")
        sys.stdout.flush()

    # reference output delta fp32 vs fp16 scores
    o32 = attn(jnp.float32)(q, k, v, bias_h, bias_w)
    o16 = attn(jnp.float16)(q, k, v, bias_h, bias_w)
    d = jnp.max(jnp.abs(o32.astype(jnp.float32) - o16.astype(jnp.float32)))
    print(f"max |fp32 - fp16| on outputs: {float(d):.5f}")


if __name__ == "__main__":
    main()
