"""Bounded-window deformable-alignment sampling as a Pallas VPU bin scan.

THE PROBLEM. The E2FGVI inpainter's second-order deformable alignment
(models/e2fgvi/modules.py `modulated_deform_conv`; reference
inpainter/model/modules/feat_prop.py:13-59 via mmcv) samples, per output
pixel, 9 taps x 16 deform groups x 4 bilinear corners from a (60, 108, 256)
feature map. On TPU that is 36 batched gathers whose XLA lowering runs at
~15 GB/s effective REGARDLESS of gather shape (BASELINE.md round-4 ledger:
per-tap 2x2-patch gathers = a wash, giant batched gathers = 9x worse,
in-kernel take_along_axis / per-row dynamic slices = Mosaic compile
failures) — 16.5 of the 16.7 ms align step, ~54% of the whole inpaint
window.

THE KERNEL. TPUs have no gather unit; the only fast primitives are dense
VPU ops over statically-addressed tiles. So instead of gathering, scan
displacement bins: for every integer displacement (ry, rx) in a bounded
window and every tap k, build the 2-nonzero bilinear selection weight field
AT the output pixel (a pure function of the precomputed offsets — no
evaluation-point problem, unlike composing gathers) and fma the
statically-shifted source rows into the accumulator:

    patches[p, k, c] = sum_{ry, rx} wsel[p, g(c), k, ry, rx] * x[p + (ry, rx), c]

Work is w^2 * K * HW * C fma (dense, regular, VPU-rate) in place of
pointer-chasing. The window radius R bounds the representable displacement
|tap + 10*tanh(residual) + flow| <= R: the tanh residual is architecturally
<= 10 and taps <= 1, so the kernel is EXACT whenever the per-pixel flow
magnitude is <= R - 12 and degrades gracefully beyond (out-of-window corner
contributions are dropped — the same zero-padding family as mmcv's
out-of-field behavior). tests/test_deform_align_kernel.py pins the
semantics in interpret mode: equality with the exact path when flows fit
the window, drop semantics beyond.

STATUS (round 4, 2026-08-20): NOT WIRED into the product — closed on
arithmetic + toolchain grounds after the full measurement campaign
(BASELINE.md "Deform-align gather attack"): the minimum exact window is
R=12 (the model's own tanh residual), putting the scan at ~10-18 ms per
align call at plausible v5e VPU rates — parity-to-loss vs the 16.5 ms XLA
gather — and the Mosaic remote compiler timed out (>30 min) on even a
128-bin unrolled probe, while fori-loop variants hit dynamic-unaligned-
sublane and 3-D-reshape lowering rejections. Kept in-tree, semantically
validated, as the revival candidate for a TPU generation with
SparseCore-assisted gather or a Mosaic dynamic-gather primitive.

LAYOUT NOTES (all load-bearing on Mosaic):
  - x is processed per HALF (first-order groups 0-7 sample channels 0:128
    with off1, second-order groups 8-15 sample 128:256 with off2) so each
    kernel instance streams (HWp, 128) rows — full-lane tiles.
  - within a half, channels are PERMUTED to cg-major order j = c*8 + g so
    the per-group selection weight (P, 8) lane-replicates to (P, 128) with
    pltpu.repeat (tile-repeat [g0..g7, g0..g7, ...] matches channel j%8).
    The inverse permutation is folded into the conv weight matrix — zero
    runtime cost.
  - W is padded 108 -> 112 columns so every row shift ry*112 is a multiple
    of 8: the per-ry band load start (tile_base + PAD + (ry-?)*112 - R,
    rounded to 8) stays sublane-ALIGNED, which Mosaic requires for dynamic
    starts; the rx in [-R, R] offsets are a STATIC unroll.
  - taps are unrolled with static lane slices of the (P, K*8) fields
    (Mosaic rejects 3-D vector reshapes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 9           # 3x3 taps
GH = 8          # groups per half
CG = 16         # channels per group
CH = GH * CG    # 128 channels per half


def _pad_w(w: int) -> int:
    return -(-w // 8) * 8


def _field_perm(ch: int = CH, gh: int = GH) -> np.ndarray:
    """Channel permutation to cg-major: j = c_in_group * GH + g."""
    cg = ch // gh
    perm = np.empty(ch, np.int64)
    for g in range(gh):
        for c in range(cg):
            perm[c * gh + g] = g * cg + c
    return perm


def _kernel(radius: int, p_tile: int, wp: int, pad_rows: int,
            x_ref, y0_ref, y1_ref, x0_ref, x1_ref,
            wy0_ref, wy1_ref, wx0_ref, wx1_ref, o_ref):
    """One tile of one half. x_ref: (HWp + 2*pad_rows, CH) fp32, resident.
    Field refs: (P, K*GH). o_ref: (P, K*CH)."""
    r = radius
    i = pl.program_id(0)
    y0 = y0_ref[:]
    y1 = y1_ref[:]
    x0 = x0_ref[:]
    x1 = x1_ref[:]
    wy0 = wy0_ref[:]
    wy1 = wy1_ref[:]
    wx0 = wx0_ref[:]
    wx1 = wx1_ref[:]

    def body(ry_i, accs):
        ry = ry_i - r
        # aligned dynamic band start: everything is a multiple of 8
        # (p_tile, pad_rows, ry*wp all % 8 == 0); rx offsets are handled by
        # the static unroll below, each a static displacement off this base.
        base = pl.multiple_of(i * p_tile + pad_rows + ry * wp - r, 8)
        # band covers rx in [-r, r]: rows [base, base + P + 2r]
        new = []
        mys = []
        for k in range(K):
            sl = slice(k * GH, (k + 1) * GH)
            my = (jnp.where(y0[:, sl] == ry, wy0[:, sl], 0.0)
                  + jnp.where(y1[:, sl] == ry, wy1[:, sl], 0.0))
            mys.append(my)
        for k in range(K):
            acc = accs[k]
            my = mys[k]
            sl = slice(k * GH, (k + 1) * GH)
            x0k = x0[:, sl]
            x1k = x1[:, sl]
            wx0k = wx0[:, sl]
            wx1k = wx1[:, sl]
            for rx_i in range(2 * r + 1):
                rx = rx_i - r
                wsel = my * (jnp.where(x0k == rx, wx0k, 0.0)
                             + jnp.where(x1k == rx, wx1k, 0.0))
                wrep = pltpu.repeat(wsel, CG, 1)          # (P, CH)
                xs = x_ref[pl.ds(base + rx_i, p_tile), :]
                acc = acc + wrep * xs
            new.append(acc)
        return tuple(new)

    accs = tuple(jnp.zeros((p_tile, CH), jnp.float32) for _ in range(K))
    accs = jax.lax.fori_loop(0, 2 * r + 1, body, accs)
    o_ref[:] = jnp.concatenate(accs, axis=1)


def _half_fields(off_half: jax.Array, mask_half: jax.Array,
                 h: int, w: int, radius: int):
    """XLA precompute for one half.

    off_half: (H, W, GH, K, 2) absolute (y, x) displacements (tap NOT yet
    added); mask_half: (H, W, GH, K) modulation. Returns int/float fields
    (HW, K*GH) in tap-major lane order plus the same bilinear weights and
    validity the exact path computes (ops equality: see module docstring)."""
    r = radius
    yy = jnp.arange(h, dtype=off_half.dtype)[:, None, None, None]
    xx = jnp.arange(w, dtype=off_half.dtype)[None, :, None, None]
    taps = jnp.asarray(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        off_half.dtype)                                    # (K, 2)
    # EXACT flow_warp arithmetic order: (off + tap) first, then + grid.
    ay = yy + (off_half[..., 0] + taps[:, 0])              # (H, W, GH, K)
    ax = xx + (off_half[..., 1] + taps[:, 1])
    y0t = jnp.floor(ay)
    x0t = jnp.floor(ax)
    wy = ay - y0t
    wx = ax - x0t

    y0i = y0t.astype(jnp.int32) - jnp.arange(h, dtype=jnp.int32)[:, None, None, None]
    x0i = x0t.astype(jnp.int32) - jnp.arange(w, dtype=jnp.int32)[None, :, None, None]

    def corner_fields(d0, base, extent):
        """relative displacement field d0 -> (clipped idx, validity)."""
        ok = (d0 >= -r) & (d0 <= r)
        inb = (base + d0 >= 0) & (base + d0 < extent)
        return jnp.clip(d0, -r, r), ok & inb

    py = jnp.arange(h, dtype=jnp.int32)[:, None, None, None]
    px = jnp.arange(w, dtype=jnp.int32)[None, :, None, None]
    y0r, oky0 = corner_fields(y0i, py, h)
    y1r, oky1 = corner_fields(y0i + 1, py, h)
    x0r, okx0 = corner_fields(x0i, px, w)
    x1r, okx1 = corner_fields(x0i + 1, px, w)

    wy0 = (1.0 - wy) * oky0
    wy1 = wy * oky1
    m = mask_half
    wx0 = (1.0 - wx) * okx0 * m
    wx1 = wx * okx1 * m

    def flat(a, dtype):
        # (H, W, GH, K) -> (HW, K*GH), tap-major lanes (k*GH + g)
        return a.transpose(0, 1, 3, 2).reshape(h * w, K * GH).astype(dtype)

    return (flat(y0r, jnp.int32), flat(y1r, jnp.int32),
            flat(x0r, jnp.int32), flat(x1r, jnp.int32),
            flat(wy0, jnp.float32), flat(wy1, jnp.float32),
            flat(wx0, jnp.float32), flat(wx1, jnp.float32))


def _pad_fields_rows(f: jax.Array, h: int, w: int, wp: int) -> jax.Array:
    """(HW, L) row fields -> (H*Wp, L): pad the W axis to Wp columns."""
    l = f.shape[-1]
    f = f.reshape(h, w, l)
    f = jnp.pad(f, ((0, 0), (0, wp - w), (0, 0)))
    return f.reshape(h * wp, l)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "radius", "interpret"))
def deform_patches_bounded(
    x: jax.Array,          # (H, W, 2*CH) features, fp32
    offset: jax.Array,     # (H, W, G*K*2) mmcv layout (y, x), flow included
    mask: jax.Array,       # (H, W, G*K) modulation
    h: int, w: int, radius: int = 16, interpret: bool = False,
) -> jax.Array:
    """Bounded-window deformable sampling -> patches (H, W, K, 2*CH) in the
    cg-major-per-half channel order (use `patch_weight_perm` to match the
    conv weight). Exact vs the gather path for displacements within
    `radius`; out-of-window corner contributions are dropped."""
    g = 2 * GH
    wp = _pad_w(w)
    hwp = h * wp
    pad_rows = -(-(radius * wp + radius) // 8) * 8
    # tile size: multiple of 8 dividing hwp
    p_tile = hwp
    for cand in (512, 480, 448, 384, 320, 256):
        if hwp % cand == 0:
            p_tile = cand
            break
    else:
        for cand in range(min(512, hwp), 7, -8):
            if hwp % cand == 0:
                p_tile = cand
                break
    n_tiles = hwp // p_tile

    off = offset.reshape(h, w, g, K, 2)
    msk = mask.reshape(h, w, g, K)
    perm = _field_perm()

    halves = []
    for hi in range(2):
        xh = x[..., hi * CH:(hi + 1) * CH][..., perm]       # cg-major lanes
        xh = jnp.pad(xh, ((0, 0), (0, wp - w), (0, 0))).reshape(hwp, CH)
        xh = jnp.pad(xh, ((pad_rows, pad_rows), (0, 0)))
        fields = _half_fields(
            off[:, :, hi * GH:(hi + 1) * GH], msk[:, :, hi * GH:(hi + 1) * GH],
            h, w, radius)
        fields = [_pad_fields_rows(f, h, w, wp) for f in fields]

        kern = functools.partial(_kernel, radius, p_tile, wp, pad_rows)
        out = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((hwp + 2 * pad_rows, CH), lambda i: (0, 0)),
                *[pl.BlockSpec((p_tile, K * GH), lambda i: (i, 0))
                  for _ in range(8)],
            ],
            out_specs=pl.BlockSpec((p_tile, K * CH), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hwp, K * CH), jnp.float32),
            interpret=interpret,
        )(xh, *fields)
        halves.append(out.reshape(h, wp, K, CH)[:, :w])
    return jnp.concatenate(halves, axis=-1)               # (H, W, K, 2CH)


def patch_weight_perm(weight: jax.Array) -> jax.Array:
    """Permute a (3, 3, Cin=256, Cout) HWIO deform-conv weight to contract
    with deform_patches_bounded's (K, cg-major-half) patch layout."""
    k_, _, cin, cout = weight.shape[0] * weight.shape[1], None, weight.shape[2], weight.shape[3]
    wm = weight.reshape(K, cin, cout)
    perm = np.concatenate([_field_perm(), CH + _field_perm()])
    wm = wm[:, perm, :]
    return wm.reshape(K * cin, cout)


def modulated_deform_conv_bounded(
    x: jax.Array,          # (B, H, W, Cin=256)
    offset: jax.Array,     # (B, H, W, 2*G*K)
    mask: jax.Array,       # (B, H, W, G*K)
    weight: jax.Array,     # (3, 3, Cin, Cout) HWIO
    bias,
    deform_groups: int,
    radius: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for models.e2fgvi.modules.modulated_deform_conv using the
    bounded-window Pallas sampler (opt-in fast gear; see module docstring
    for the exactness domain)."""
    assert deform_groups == 2 * GH and x.shape[-1] == 2 * CH, (
        "bounded deform kernel is specialized to G=16, Cin=256 "
        "(the E2FGVI propagation shapes)")
    b, h, w, cin = x.shape
    wmat = patch_weight_perm(weight)

    def one(xb, ob, mb):
        patches = deform_patches_bounded(
            xb, ob, mb, h, w, radius=radius, interpret=interpret)
        out = jnp.dot(
            patches.reshape(h, w, K * cin), wmat.astype(patches.dtype),
            preferred_element_type=patches.dtype)
        return out

    out = jax.vmap(one)(x, offset, mask)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
