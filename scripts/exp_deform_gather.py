"""Deform-conv gather restructures, A/B'd on the real chip.

exp_deform_anatomy.py showed the 36 per-(tap, corner) batched gathers are
~16.5 of the 16.7 ms align step (the useful work is ~120 MFLOP — pure data
movement at ~1.7% of HBM bandwidth). Generations measured here, all EXACT
(asserted against the shipped 4-gather flow_warp form):

  g0   shipped gathers_only baseline (re-measured same-session)
  g5a  per-tap 2x2-patch gather: ONE lax.gather per tap with
       slice_sizes (2, 2, 1, cg) fetches all 4 bilinear corners of every
       (pixel, group) in one indexed fetch — 4x fewer indexed fetches,
       4x wider granules; corner values recovered with edge-exact selects
  g5b  all 9 taps in ONE lax.gather (9x fewer gather HLOs than g5a)
  g5c  g5b + the tap matmul + mask fused behind it (the full
       modulated_deform_conv candidate)

Run: python scripts/exp_deform_gather.py [H W C] [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def device_loop(fn, n):
    @jax.jit
    def run(*args):
        def step(carry, _):
            out = fn(*jax.tree.map(
                lambda a: a + carry.astype(a.dtype) * 0, args))
            leaf = jax.tree.leaves(out)[0]
            return carry + jnp.float32(
                jnp.sum(leaf.astype(jnp.float32))) * 1e-30, 0

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return c

    return run


def timeit(name, fn, *args, n=20):
    run = device_loop(fn, n)
    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:22s} {ms:8.3f} ms/iter", flush=True)
    return ms


# --------------------------------------------------------- patch gather

def patch_gather_taps(x4: jax.Array, offset: jax.Array, mask: jax.Array,
                      per_tap: bool) -> jax.Array:
    """x4: (H, W, G, cg); offset: (H, W, G, K, 2) absolute mmcv (y, x)
    residuals (tap displacement NOT yet added); mask: (H, W, G, K).
    Returns patches (H, W, K, G*cg) == the stacked taps of
    modulated_deform_conv (bit-exact corner math)."""
    h, w, g, cg = x4.shape
    k = offset.shape[3]

    taps = []
    idx = 0
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=offset.dtype),
                          jnp.arange(w, dtype=offset.dtype), indexing="ij")

    def one_tap(dy, dx, o, m):
        # absolute sample position — EXACT flow_warp arithmetic order
        # (modules.py: flow = stack([o_x + dx, o_y + dy]); gx = xx + flow):
        # (o + d) first, then + grid, so fp results match bit for bit.
        ay = gy[:, :, None] + (o[..., 0] + dy)          # (H, W, G)
        ax = gx[:, :, None] + (o[..., 1] + dx)
        y0 = jnp.floor(ay)
        x0 = jnp.floor(ax)
        wy = (ay - y0)[..., None]
        wx = (ax - x0)[..., None]
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        ys = jnp.clip(y0i, 0, h - 2)
        xs = jnp.clip(x0i, 0, w - 2)
        return ys, xs, y0i, x0i, wy, wx, m

    fields = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            fields.append(one_tap(dy, dx, offset[:, :, :, idx, :],
                                  mask[:, :, :, idx]))
            idx += 1

    gidx = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[None, None, :], (h, w, g))

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(2,),
        start_index_map=(0, 1, 2),
    )

    def gather_starts(ys, xs):
        starts = jnp.stack([ys, xs, gidx], axis=-1).reshape(-1, 3)
        out = lax.gather(
            x4, starts, dnums, slice_sizes=(2, 2, 1, cg),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )                                   # (HWG, 2, 2, cg)
        return out.reshape(h, w, g, 2, 2, cg)

    def corners_from_patch(P, ys, xs, y0i, x0i):
        # corner (a, b): true value x[clip(y0+a), clip(x0+b)] * inb
        def corner(a, b):
            yy = y0i + a
            xx = x0i + b
            ay = (jnp.clip(yy, 0, h - 1) - ys)[..., None]   # 0/1
            ax = (jnp.clip(xx, 0, w - 1) - xs)[..., None]
            v = jnp.where(
                ay == 0,
                jnp.where(ax == 0, P[:, :, :, 0, 0], P[:, :, :, 0, 1]),
                jnp.where(ax == 0, P[:, :, :, 1, 0], P[:, :, :, 1, 1]),
            )
            inb = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
            return v * inb.astype(v.dtype)

        return corner(0, 0), corner(0, 1), corner(1, 0), corner(1, 1)

    if per_tap:
        for (ys, xs, y0i, x0i, wy, wx, m) in fields:
            P = gather_starts(ys, xs)
            v00, v01, v10, v11 = corners_from_patch(P, ys, xs, y0i, x0i)
            s = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                 + v10 * (1 - wx) * wy + v11 * wx * wy)
            taps.append((s * m[..., None]).reshape(h, w, g * cg))
        return jnp.stack(taps, axis=2)      # (H, W, K, G*cg)

    # g5b: one gather for all taps
    ys_all = jnp.stack([f[0] for f in fields], axis=3)   # (H, W, G, K)
    xs_all = jnp.stack([f[1] for f in fields], axis=3)
    gidx_k = jnp.broadcast_to(gidx[..., None], (h, w, g, k))
    starts = jnp.stack([ys_all, xs_all, gidx_k], axis=-1).reshape(-1, 3)
    P = lax.gather(
        x4, starts, dnums, slice_sizes=(2, 2, 1, cg),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(h, w, g, k, 2, 2, cg)
    outs = []
    for ki, (ys, xs, y0i, x0i, wy, wx, m) in enumerate(fields):
        Pk = P[:, :, :, ki]
        v00, v01, v10, v11 = corners_from_patch(Pk, ys, xs, y0i, x0i)
        s = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
             + v10 * (1 - wx) * wy + v11 * wx * wy)
        outs.append((s * m[..., None]).reshape(h, w, g * cg))
    return jnp.stack(outs, axis=2)


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.models.e2fgvi import modules as M

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 108
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    g, k = 16, 9
    cin = 2 * c
    cg = cin // g
    dtype = jnp.float32
    print(f"deform gather A/B: {h}x{w} Cin={cin} G={g} {dtype.__name__} N={n}")

    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 6)
    x = jax.random.normal(ks[0], (1, h, w, cin), dtype)
    # realistic offsets: bounded tanh residual + a +-6 px flow field
    resid = 10.0 * jnp.tanh(jax.random.normal(ks[1], (1, h, w, g, k, 2), dtype))
    flow = 6.0 * jax.random.normal(ks[2], (1, h, w, 1, 1, 2), dtype)
    off = (resid + flow).reshape(1, h, w, g * k * 2)
    mask = jax.nn.sigmoid(jax.random.normal(ks[3], (1, h, w, g * k), dtype))
    wgt = jax.random.normal(ks[4], (3, 3, cin, c), dtype) * 0.05

    # ---- g0: shipped form (gathers only, same as exp_deform_anatomy) -----
    def g0(x, off, mask):
        b = 1
        offr = off.reshape(b, h, w, g, k, 2)
        m = mask.reshape(b, h, w, g, k)
        taps = []
        idx = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                o = offr[:, :, :, :, idx, :]
                fl = jnp.stack([o[..., 1] + dx, o[..., 0] + dy], axis=-1)
                xg = x.reshape(b, h, w, g, cg)
                sampled = jax.vmap(
                    lambda xx, ff: M.flow_warp(xx, ff),
                    in_axes=(3, 3), out_axes=3)(xg, fl)
                sampled = sampled * m[:, :, :, :, idx][..., None]
                taps.append(sampled.reshape(b, h, w, cin))
                idx += 1
        return jnp.stack(taps, axis=3)        # (B, H, W, K, Cin)

    def g5(x, off, mask, per_tap):
        x4 = x.reshape(h, w, g, cg)
        offr = off.reshape(h, w, g, k, 2)
        m = mask.reshape(h, w, g, k)
        return patch_gather_taps(x4, offr, m, per_tap)

    # exactness first (bit-level: same reads, same weight order)
    ref = np.asarray(g0(x, off, mask))[0]                  # (H, W, K, Cin)
    got_a = np.asarray(g5(x, off, mask, True))
    got_b = np.asarray(g5(x, off, mask, False))
    np.testing.assert_allclose(got_a, ref, rtol=0, atol=0)
    np.testing.assert_allclose(got_b, ref, rtol=0, atol=0)
    print("  exactness: g5a/g5b BIT-EQUAL to the shipped form", flush=True)

    timeit("g0_shipped", g0, x, off, mask, n=n)
    timeit("g5a_patch_per_tap", lambda a, b, c2: g5(a, b, c2, True),
           x, off, mask, n=n)
    timeit("g5b_patch_all_taps", lambda a, b, c2: g5(a, b, c2, False),
           x, off, mask, n=n)

    # g5c: full mdc on top of g5b (gather + matmul fused in one jit)
    def g5c(x, off, mask):
        patches = g5(x, off, mask, False)     # (H, W, K, Cin)
        wmat = wgt.reshape(9 * cin, -1)
        return jnp.dot(patches.reshape(h, w, 9 * cin), wmat,
                       preferred_element_type=dtype)

    def g0c(x, off, mask):
        patches = g0(x, off, mask)
        wmat = wgt.reshape(9 * cin, -1)
        return jnp.dot(patches.reshape(1, h, w, 9 * cin), wmat,
                       preferred_element_type=dtype)

    np.testing.assert_allclose(
        np.asarray(g5c(x, off, mask)), np.asarray(g0c(x, off, mask))[0],
        rtol=0, atol=0)
    timeit("g0_mdc_full", g0c, x, off, mask, n=n)
    timeit("g5c_mdc_full", g5c, x, off, mask, n=n)


if __name__ == "__main__":
    main()
