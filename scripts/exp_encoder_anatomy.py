"""Unrolled windowed-encoder anatomy at PRODUCTION shapes on the real chip.

The round-2 scan-of-one-block measurements (exp_encoder_opt.py) overstate
per-block cost ~3x vs the real unrolled encoder, so this times a real
28-block tower (distinct params per block, like vit_h's windowed blocks)
at the bench's exact shapes — K frames x 36x64 tokens x 1280 — and ablates
one component at a time to locate the non-matmul overhead:

  full        : LN + windowed attn (fused-bias) + proj + LN + MLP (the bench path)
  no_attn     : LN + qkv matmul + proj + LN + MLP (score path removed)
  no_ln       : windowed attn + proj + MLP, layernorms removed
  mlp_only    : pure  x + MLP(LN(x))  tower (the MXU speed-of-light probe)
  matmul_only : x @ W1 @ W2 tower, no LN/gelu/residual (chip ceiling check)

Prints ms/frame and effective TFLOPS for each. Run with the host idle:
  python scripts/exp_encoder_anatomy.py [K] [tokens_h tokens_w] [blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.sam import image_encoder as IE
from vosesam_tpu.models.layers import layer_norm, linear, gelu


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    th = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    tw = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    nblocks = int(sys.argv[4]) if len(sys.argv) > 4 else 28
    dim, heads, window = 1280, 16, 14
    dtype = jnp.bfloat16

    cfg = SAMConfig(model_type="vit_h")
    key = jax.random.PRNGKey(0)
    # distinct params per block, vit_h windowed dims
    blocks = []
    for i in range(nblocks):
        kb = jax.random.fold_in(key, i)
        p = {
            "norm1": {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)},
            "attn": {
                "qkv": {"weight": 0.02 * jax.random.normal(kb, (dim, 3 * dim), dtype),
                        "bias": jnp.zeros((3 * dim,), dtype)},
                "proj": {"weight": 0.02 * jax.random.normal(jax.random.fold_in(kb, 1), (dim, dim), dtype),
                         "bias": jnp.zeros((dim,), dtype)},
                "rel_pos_h": jnp.zeros((2 * window - 1, dim // heads), dtype),
                "rel_pos_w": jnp.zeros((2 * window - 1, dim // heads), dtype),
            },
            "norm2": {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)},
            "mlp": {
                "lin1": {"weight": 0.02 * jax.random.normal(jax.random.fold_in(kb, 2), (dim, 4 * dim), dtype),
                         "bias": jnp.zeros((4 * dim,), dtype)},
                "lin2": {"weight": 0.02 * jax.random.normal(jax.random.fold_in(kb, 3), (4 * dim, dim), dtype),
                         "bias": jnp.zeros((dim,), dtype)},
            },
        }
        blocks.append(p)
    x = 0.1 * jax.random.normal(jax.random.fold_in(key, 99), (k, th, tw, dim), dtype)

    def tower_full(ps, y):
        for p in ps:
            y = IE._block(y, p, heads, window, windowed_impl="xla_fused_bias")
        return y

    def tower_no_attn(ps, y):
        for p in ps:
            s = y
            z = layer_norm(y, p["norm1"])
            z = linear(z.reshape(k, th * tw, dim), p["attn"]["qkv"])
            z = linear(z[..., :dim], p["attn"]["proj"]).reshape(k, th, tw, dim)
            y = s + z
            z = layer_norm(y, p["norm2"])
            y = y + linear(gelu(linear(z, p["mlp"]["lin1"])), p["mlp"]["lin2"])
        return y

    def tower_mlp_only(ps, y):
        for p in ps:
            z = layer_norm(y, p["norm2"])
            y = y + linear(gelu(linear(z, p["mlp"]["lin1"])), p["mlp"]["lin2"])
        return y

    def tower_matmul_only(ps, y):
        y = y.reshape(k, th * tw, dim)
        for p in ps:
            y = linear(linear(y, p["mlp"]["lin1"]), p["mlp"]["lin2"])
        return y

    n_tok = th * tw
    # FLOP counts per frame per block
    f_qkv = 2 * n_tok * dim * 3 * dim
    f_proj = 2 * n_tok * dim * dim
    f_mlp = 2 * 2 * n_tok * dim * 4 * dim
    # padded window tokens for the score path
    import math as _m
    hp = -(-th // window) * window
    wp = -(-tw // window) * window
    f_scores = 2 * 2 * hp * wp * window * window * dim
    flops = {
        "full": f_qkv + f_proj + f_mlp + f_scores,
        "no_attn": f_qkv + f_proj + f_mlp,
        "mlp_only": f_mlp,
        "matmul_only": f_mlp,
    }

    for name, fn in [("matmul_only", tower_matmul_only),
                     ("mlp_only", tower_mlp_only),
                     ("no_attn", tower_no_attn),
                     ("full", tower_full)]:
        jf = jax.jit(fn)
        out = jf(blocks, x); np.asarray(out)
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            out = jf(blocks, x)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        per_frame = ms / k
        tf = flops[name] * nblocks * k / (ms / 1e3) / 1e12
        print(f"{name:12s} {ms:8.1f} ms/iter  {per_frame:6.2f} ms/frame/"
              f"{nblocks}blk  {tf:6.1f} eff TFLOPS", flush=True)


if __name__ == "__main__":
    main()
