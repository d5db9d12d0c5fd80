"""Fused flash attention with decomposed relative-position bias (Pallas TPU).

Why: SAM's ViT global-attention blocks attend over N = (H/16)² = 4096 tokens.
The XLA path materializes the additive decomposed rel-pos bias and the
attention matrix at (heads, N, N) fp32 — ~1 GB of HBM traffic per block,
which dominates the encoder's runtime (SURVEY.md §3.2: the ViT encode is the
pipeline's hottest op). This kernel keeps the bias FACTORIZED:

    bias[q, k] = bh[q, row(k)] + bw[q, col(k)]

where bh = einsum(q, rel_pos_h) is only (heads, N, gh) and bw is
(heads, N, gw) — 16 MB instead of 1 GB. Tiles of the bias are reconstructed
in VMEM from these factors inside the online-softmax loop, so nothing
quadratic ever touches HBM.

K/V tiles are aligned to token-grid rows (Tk = rows_per_tile * gw), making
row/col index reconstruction static slicing instead of gathers.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,      # (Tq, D)
    k_ref,      # (N, D)
    v_ref,      # (N, D)
    bh_ref,     # (Tq, gh) bias rows for this q tile
    bw_ref,     # (Tq, gw)
    o_ref,      # (Tq, D)
    *,
    tk: int,
    gw: int,
    scale: float,
):
    _, tq, d = q_ref.shape
    n = k_ref.shape[1]
    rows_per_tile = tk // gw
    num_tiles = n // tk

    # Keep q/k/v in their storage dtype (bf16) for the dots: the MXU runs
    # bf16 x bf16 -> fp32-accum at ~4x the fp32 rate, and this matches the
    # XLA path's numerics exactly (einsum with preferred fp32 from bf16
    # inputs). Casting to fp32 BEFORE the dot (the original kernel) ran the
    # whole attention at fp32 MXU rate — measured 8.4 ms/frame for the four
    # global blocks vs ~13.6 GF each (13 TFLOPS effective).
    q = q_ref[0]

    gh = bh_ref.shape[-1]

    # Loop-invariant one-hot EXPANSION matrices: key k_local of a tile sits
    # at grid (row, col) = (k_local // gw, k_local % gw), so
    #   bias_tile = bh_tile @ expand_rows + bw @ expand_cols
    # — two small MXU dots instead of a rows_per_tile-piece lane concat
    # (the concat dominated kernel time at large tiles).
    klanes = jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, tk), 1)
    rlanes = jax.lax.broadcasted_iota(jnp.int32, (rows_per_tile, tk), 0)
    expand_rows = (klanes // gw == rlanes).astype(jnp.float32)  # (rpt, Tk)
    klanes2 = jax.lax.broadcasted_iota(jnp.int32, (gw, tk), 1)
    clanes = jax.lax.broadcasted_iota(jnp.int32, (gw, tk), 0)
    expand_cols = (klanes2 % gw == clanes).astype(jnp.float32)  # (gw, Tk)

    def body(j, carry):
        m_prev, l_prev, acc = carry
        start = pl.multiple_of(j * tk, tk)
        k_tile = k_ref[0, pl.ds(start, tk), :]
        v_tile = v_ref[0, pl.ds(start, tk), :]
        s = jnp.dot(q, k_tile.T,
                    preferred_element_type=jnp.float32) * scale  # (Tq, Tk)

        # reconstruct the bias tile from factorized terms: k tokens in this
        # tile span rows [j*rpt, (j+1)*rpt) of the grid, all gw columns.
        # Row selection via a one-hot matmul — Mosaic can't dynamically
        # slice the lane dimension at sub-128 granularity.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (gh, rows_per_tile), 0)
        want = j * rows_per_tile + jax.lax.broadcasted_iota(
            jnp.int32, (gh, rows_per_tile), 1
        )
        onehot = (row_ids == want).astype(jnp.float32)        # (gh, rpt)
        bh_tile = jnp.dot(
            bh_ref[0].astype(jnp.float32), onehot,
            preferred_element_type=jnp.float32,
        )                                                      # (Tq, rpt)
        bias = (
            jnp.dot(bh_tile, expand_rows,
                    preferred_element_type=jnp.float32)
            + jnp.dot(bw_ref[0], expand_cols,
                      preferred_element_type=jnp.float32)
        )                                                      # (Tq, Tk)
        s = s + bias

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # bf16 probabilities into the AV dot (fp32 accum) — identical to the
        # XLA path's softmax(...).astype(v.dtype) before the AV einsum.
        acc = acc * alpha + jnp.dot(
            p.astype(v_tile.dtype), v_tile,
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_tiles, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _window_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *,
                   tokens: int, wh: int, ww: int, scale: float):
    """One whole window per grid step — everything fits in VMEM.

    Refs are (1, 1, Tpad, D) / (1, 1, Tpad, wh|ww); tail rows beyond `tokens`
    are masked out of the softmax."""
    tpad, d = q_ref.shape[2], q_ref.shape[3]
    # bf16 dots with fp32 accumulation (see _flash_kernel note): the fp32
    # pre-cast of the original kernel quartered the MXU rate and was the
    # reason the round-1 window kernels lost their in-situ A/Bs.
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T,
                preferred_element_type=jnp.float32) * scale   # (Tpad, Tpad)

    bh = bh_ref[0, 0].astype(jnp.float32)    # (Tpad, wh)
    bw = bw_ref[0, 0].astype(jnp.float32)    # (Tpad, ww)
    # one-hot expansion dots (see _window_kernel_mh): bias = bh@E + bw@F,
    # pad lanes masked to NEG_INF
    jl = jax.lax.broadcasted_iota(jnp.int32, (wh, tpad), 1)
    rl = jax.lax.broadcasted_iota(jnp.int32, (wh, tpad), 0)
    expand_rows = ((jl // ww == rl) & (jl < tokens)).astype(jnp.float32)
    jl2 = jax.lax.broadcasted_iota(jnp.int32, (ww, tpad), 1)
    cl = jax.lax.broadcasted_iota(jnp.int32, (ww, tpad), 0)
    expand_cols = ((jl2 % ww == cl) & (jl2 < tokens)).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tpad), 1)
    s = s + (
        jnp.dot(bh, expand_rows, preferred_element_type=jnp.float32)
        + jnp.dot(bw, expand_cols, preferred_element_type=jnp.float32)
        + jnp.where(lane < tokens, 0.0, NEG_INF)
    )

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32) / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def window_attention_relpos(
    q: jax.Array,        # (W, heads, T, D) — W windows (any batch folded in)
    k: jax.Array,
    v: jax.Array,
    bias_h: jax.Array,   # (W, heads, T, wh)
    bias_w: jax.Array,   # (W, heads, T, ww)
    window_hw: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """Fused windowed attention with factorized rel-pos bias: one grid step
    per (window, head), score matrix lives only in VMEM. Replaces the XLA
    path that materializes (W, heads, T, T) in HBM — the blocker for
    batching SAM encodes across frames."""
    w, heads, t, d = q.shape
    wh, ww = window_hw
    assert t == wh * ww
    scale = 1.0 / math.sqrt(d)
    tpad = -(-t // 8) * 8
    dp = -(-d // 128) * 128

    def pad3(a, last):
        return jnp.pad(a, ((0, 0), (0, 0), (0, tpad - t), (0, last - a.shape[-1])))

    qp, kp, vp = pad3(q, dp), pad3(k, dp), pad3(v, dp)
    bhp = pad3(bias_h, bias_h.shape[-1])
    bwp = pad3(bias_w, bias_w.shape[-1])

    kernel = functools.partial(
        _window_kernel, tokens=t, wh=wh, ww=ww, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=(w, heads),
        in_specs=[
            pl.BlockSpec((1, 1, tpad, dp), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, tpad, dp), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, tpad, dp), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, tpad, wh), lambda i, h: (i, h, 0, 0)),
            pl.BlockSpec((1, 1, tpad, ww), lambda i, h: (i, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tpad, dp), lambda i, h: (i, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, heads, tpad, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bhp, bwp)
    return out[:, :, :t, :d]


def _window_kernel_mh(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *,
                      tokens: int, wh: int, ww: int, scale: float,
                      heads: int):
    """One whole window per grid step, ALL heads in the instance.

    vs _window_kernel's (window, head) grid: 16x fewer grid instances —
    per-instance fixed overhead (DMA setup, control) was the dominant cost
    of the per-head variant at vit_h sizes (400 instances/frame-block of
    ~12 MFLOP each). Refs are (1, heads, Tpad, D)."""
    tpad, d = q_ref.shape[2], q_ref.shape[3]

    # Loop-invariant one-hot expansion: key j sits at (j // ww, j % ww), so
    # bias = bh @ E + bw @ F with E[r, j] = (j//ww == r), F[c, j] = (j%ww == c)
    # — two MXU dots per head instead of a wh-piece lane concat (gen-3; the
    # concat build was the VPU hot spot of gen-1/2). Pad lanes j >= tokens
    # get NEG_INF via an additive mask row folded into E's row 0 path.
    jl = jax.lax.broadcasted_iota(jnp.int32, (wh, tpad), 1)
    rl = jax.lax.broadcasted_iota(jnp.int32, (wh, tpad), 0)
    expand_rows = ((jl // ww == rl) & (jl < tokens)).astype(jnp.float32)
    jl2 = jax.lax.broadcasted_iota(jnp.int32, (ww, tpad), 1)
    cl = jax.lax.broadcasted_iota(jnp.int32, (ww, tpad), 0)
    expand_cols = ((jl2 % ww == cl) & (jl2 < tokens)).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tpad), 1)
    pad_mask = jnp.where(lane < tokens, 0.0, NEG_INF)          # (1, Tpad)

    for h in range(heads):
        # bf16 dots, fp32 accum (see _flash_kernel note)
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale

        bh = bh_ref[0, h].astype(jnp.float32)
        bw = bw_ref[0, h].astype(jnp.float32)
        bias = (
            jnp.dot(bh, expand_rows, preferred_element_type=jnp.float32)
            + jnp.dot(bw, expand_cols, preferred_element_type=jnp.float32)
            + pad_mask
        )
        s = s + bias

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32) / jnp.maximum(
            l, 1e-30)
        o_ref[0, h] = o.astype(o_ref.dtype)


def window_attention_relpos_mh(
    q: jax.Array,        # (W, heads, T, D)
    k: jax.Array,
    v: jax.Array,
    bias_h: jax.Array,   # (W, heads, T, wh)
    bias_w: jax.Array,   # (W, heads, T, ww)
    window_hw: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """Fused windowed attention, one grid step per WINDOW (heads looped
    in-kernel). Same math as window_attention_relpos."""
    w, heads, t, d = q.shape
    wh, ww = window_hw
    assert t == wh * ww
    scale = 1.0 / math.sqrt(d)
    tpad = -(-t // 8) * 8
    dp = -(-d // 128) * 128

    def pad3(a, last):
        return jnp.pad(a, ((0, 0), (0, 0), (0, tpad - t), (0, last - a.shape[-1])))

    qp, kp, vp = pad3(q, dp), pad3(k, dp), pad3(v, dp)
    bhp = pad3(bias_h, bias_h.shape[-1])
    bwp = pad3(bias_w, bias_w.shape[-1])

    # heads per instance: all 16 heads' refs at vit_h window shapes overflow
    # the 16 MB scoped-VMEM stack by ~1 MB — split the head axis across the
    # grid instead (largest divisor of `heads` with <= 8 heads/instance).
    hb = next(g for g in (8, 6, 4, 3, 2, 1) if heads % g == 0)
    kernel = functools.partial(
        _window_kernel_mh, tokens=t, wh=wh, ww=ww, scale=scale, heads=hb
    )
    out = pl.pallas_call(
        kernel,
        grid=(w, heads // hb),
        in_specs=[
            pl.BlockSpec((1, hb, tpad, dp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, tpad, dp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, tpad, dp), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, tpad, wh), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, tpad, ww), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, tpad, dp), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, heads, tpad, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bhp, bwp)
    return out[:, :, :t, :d]


def flash_attention_relpos(
    q: jax.Array,        # (heads, N, D)
    k: jax.Array,        # (heads, N, D)
    v: jax.Array,        # (heads, N, D)
    bias_h: jax.Array,   # (heads, N, gh) factorized row bias
    bias_w: jax.Array,   # (heads, N, gw) factorized col bias
    grid_hw: Tuple[int, int],
    q_tile: int = 256,
    kv_rows_per_tile: int = 36,
    interpret: bool = False,
) -> jax.Array:
    """Softmax(q·kᵀ/√d + bias) · v with the bias kept factorized.

    N must equal gh*gw (row-major token grid); D is padded to a multiple of
    128 internally."""
    heads, n, d = q.shape
    gh, gw = grid_hw
    assert n == gh * gw, (n, gh, gw)
    # Largest rows-per-tile <= requested that (a) tiles the grid height and
    # (b) keeps the K/V tile sublane count 16-aligned (bf16 tiling). Bigger
    # tiles amortize the per-iteration bias reconstruction and loop control:
    # at rect vit_h shapes (36x64 grid) tk grows 128 -> 384 (3x fewer
    # iterations of 3x bigger MXU dots).
    r = kv_rows_per_tile
    while r > 1 and (gh % r or (r * gw) % 16):
        r -= 1
    tk = r * gw
    assert n % tk == 0
    scale = 1.0 / math.sqrt(d)

    dp = -(-d // 128) * 128
    if dp != d:
        pad = [(0, 0), (0, 0), (0, dp - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    num_q = -(-n // q_tile)
    assert n % q_tile == 0

    kernel = functools.partial(_flash_kernel, tk=tk, gw=gw, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(heads, num_q),
        in_specs=[
            pl.BlockSpec((1, q_tile, dp), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, n, dp), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, n, dp), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, q_tile, gh), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, q_tile, gw), lambda h, i: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_tile, dp), lambda h, i: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((heads, n, dp), q.dtype),
        interpret=interpret,
    )(q, k, v, bias_h, bias_w)
    return out[:, :, :d]
