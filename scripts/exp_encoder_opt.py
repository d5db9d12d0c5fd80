"""Windowed-block anatomy on the real chip: where do the non-matmul ms go?

Round-1 facts (BASELINE.md): the vit_h encode runs at ~40-45 TFLOPS in-situ
while a dependent matmul chain sustains 76.5 — about half the encode is
non-matmul. This experiment decomposes ONE windowed block at the exact
in-situ shapes of the chunked K=4 480p path (x: (4, 64, 64, 1280) bf16,
100 windows of 14x14) with dependent-scan timing (one dispatch, n iters,
latency-free — per BASELINE.md, sequential per-dispatch timing lies on this
tunnel).

Variants:
  hbm        pointwise y = x*a+b over a 128 MB array       -> effective GB/s
  full       the production XLA windowed block
  nobias     block with the rel-pos bias omitted           -> bias cost
  noscore    qkv -> v -> proj -> MLP (no QK^T/softmax/AV)  -> score-path cost
  fusedbias  bias folded INTO the QK matmul: q' = [q*scale, bh, bw],
             k' = [k, onehot_row, onehot_col] so the (b, heads, T, wh, ww)
             broadcast bias tensor never exists
  winmajor   block on pre-partitioned (100, 14, 14, C) activations (no
             partition/unpartition transposes; MLP runs on the 19.6% pad
             lanes — the window-major-persistent-layout candidate)
  global     the production global block (flash kernel) for scale

Run: PYTHONPATH=.:$PYTHONPATH python scripts/exp_encoder_opt.py
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_ITERS = 28          # one encoder's worth of windowed blocks
K = 4                 # chunk size of the headline path
DIM, HEADS, WSZ = 1280, 16, 14
GRID = 64             # 1024/16 tokens


def timed_scan(fn, x, n=N_ITERS, reps=3):
    """Dependent chain: scan fn over its own output; time steady-state."""
    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    for attempt in range(3):
        try:
            out = run(x)
            break
        except Exception as e:  # noqa: BLE001
            print(f"  [compile retry {attempt+1}: {type(e).__name__}]", flush=True)
            time.sleep(5)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / n * 1e3  # ms per iteration


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from vosesam_tpu.config import SAMConfig
    from vosesam_tpu.models.layers import layer_norm, linear, gelu
    from vosesam_tpu.models.sam import image_encoder as IE

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    cfg = SAMConfig(model_type="vit_h")
    # one block's params at vit_h dims (windowed block -> rel tables 2*14-1)
    params = IE.vit_init(key, cfg, dtype=jnp.bfloat16)["blocks"]["0"]

    x = jax.random.normal(key, (K, GRID, GRID, DIM), jnp.bfloat16) * 0.02

    # --- HBM probe -------------------------------------------------------
    big = jax.random.normal(key, (64, 1024, 1024), jnp.float32)  # 256 MB

    def hbm_step(c):
        return c * 1.000001 + 1e-7

    ms = timed_scan(hbm_step, big, n=64)
    gbs = 2 * big.size * 4 / (ms / 1e3) / 1e9
    print(f"hbm       : {ms:7.3f} ms/iter  -> {gbs:7.1f} GB/s effective", flush=True)

    # --- production block ------------------------------------------------
    def full(c):
        return IE._block(c, params, HEADS, WSZ)

    # --- no bias ---------------------------------------------------------
    def attn_nobias(xw, p):
        b, h, w, c = xw.shape
        hd = c // HEADS
        qkv = linear(xw.reshape(b, h * w, c), p["qkv"]).reshape(
            b, h * w, 3, HEADS, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqnc,bknc->bnqk", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(b, h * w, c)
        return linear(out, p["proj"]).reshape(b, h, w, c)

    def block_with(attn_fn):
        def blk(c):
            shortcut = c
            y = layer_norm(c, params["norm1"])
            y, pad_hw = IE._window_partition(y, WSZ)
            y = attn_fn(y, params["attn"])
            y = IE._window_unpartition(y, WSZ, pad_hw, (c.shape[1], c.shape[2]))
            c = shortcut + y
            y = layer_norm(c, params["norm2"])
            y = linear(gelu(linear(y, params["mlp"]["lin1"])), params["mlp"]["lin2"])
            return c + y
        return blk

    # --- no score path (qkv -> v -> proj; no attention matmuls) ----------
    def attn_noscore(xw, p):
        b, h, w, c = xw.shape
        hd = c // HEADS
        qkv = linear(xw.reshape(b, h * w, c), p["qkv"]).reshape(
            b, h * w, 3, HEADS, hd)
        v = qkv[:, :, 2].reshape(b, h * w, c)
        return linear(v, p["proj"]).reshape(b, h, w, c)

    # --- bias fused into the QK matmul -----------------------------------
    def attn_fusedbias(xw, p):
        b, h, w, c = xw.shape
        hd = c // HEADS
        n = h * w
        qkv = linear(xw.reshape(b, n, c), p["qkv"]).reshape(b, n, 3, HEADS, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        bias_h, bias_w = IE._factorized_rel_pos_bias(
            q, p["rel_pos_h"], p["rel_pos_w"], (h, w), (h, w))
        scale = 1.0 / math.sqrt(hd)
        bh = bias_h.transpose(0, 2, 1, 3).astype(q.dtype)  # (b, N, heads, wh)
        bw = bias_w.transpose(0, 2, 1, 3).astype(q.dtype)
        qp = jnp.concatenate([q * scale, bh, bw], axis=-1)
        rows = jnp.arange(n) // w
        cols = jnp.arange(n) % w
        erow = jax.nn.one_hot(rows, h, dtype=q.dtype)       # (N, wh)
        ecol = jax.nn.one_hot(cols, w, dtype=q.dtype)       # (N, ww)
        kp = jnp.concatenate([
            k,
            jnp.broadcast_to(erow[None, :, None, :], (b, n, HEADS, h)),
            jnp.broadcast_to(ecol[None, :, None, :], (b, n, HEADS, w)),
        ], axis=-1)
        attn = jnp.einsum("bqnc,bknc->bnqk", qp, kp,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknc->bqnc", attn, v).reshape(b, n, c)
        return linear(out, p["proj"]).reshape(b, h, w, c)

    # --- window-major persistent layout (no transposes, pad lanes live) --
    nwin = (GRID + WSZ - 1) // WSZ            # 5
    xw0, _ = IE._window_partition(x, WSZ)     # (K*25, 14, 14, C)
    tokmask = np.zeros((nwin * WSZ, nwin * WSZ), np.float32)
    tokmask[:GRID, :GRID] = 1.0
    tokmask = jnp.asarray(
        tokmask.reshape(nwin, WSZ, nwin, WSZ).transpose(0, 2, 1, 3)
        .reshape(nwin * nwin, WSZ, WSZ, 1))
    tokmask_k = jnp.tile(tokmask, (K, 1, 1, 1)).astype(jnp.bfloat16)

    def winmajor(c):
        shortcut = c
        y = layer_norm(c, params["norm1"]) * tokmask_k
        y = IE._attention(y, params["attn"], HEADS, (WSZ, WSZ))
        c = shortcut + y
        y = layer_norm(c, params["norm2"])
        y = linear(gelu(linear(y, params["mlp"]["lin1"])), params["mlp"]["lin2"])
        return c + y

    # --- global block (flash) at in-situ shape ---------------------------
    gparams = {
        **params,
        "attn": {**params["attn"],
                 "rel_pos_h": jnp.zeros((2 * GRID - 1, DIM // HEADS), jnp.bfloat16),
                 "rel_pos_w": jnp.zeros((2 * GRID - 1, DIM // HEADS), jnp.bfloat16)},
    }

    def global_flash(c):
        def one(f):
            return IE._block(f[None], gparams, HEADS, 0, use_flash=True)[0]
        return jax.vmap(one)(c)

    def global_xla(c):
        return IE._block(c, gparams, HEADS, 0, use_flash=False)

    variants = [
        ("full", full, x),
        ("nobias", block_with(attn_nobias), x),
        ("noscore", block_with(attn_noscore), x),
        ("fusedbias", block_with(attn_fusedbias), x),
        ("winmajor", winmajor, xw0),
        ("global_flash", global_flash, x),
        ("global_xla", global_xla, x),
    ]
    results = {}
    for name, fn, xin in variants:
        ms = timed_scan(fn, xin)
        results[name] = ms
        print(f"{name:12s}: {ms:7.3f} ms/iter ({ms / K:6.3f} ms/frame-block)",
              flush=True)

    f = results.get("full")
    if f:
        print("\n--- deltas (ms/iter at K=4) ---")
        for name in ("nobias", "noscore", "fusedbias", "winmajor"):
            if name in results:
                print(f"full - {name:10s} = {f - results[name]:+7.3f}")


if __name__ == "__main__":
    main()
