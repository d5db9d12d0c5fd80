"""Anatomy of ONE second_order_deform_align step on the real chip.

The inpainter's bidirectional propagation (584 ms/window fp32, prop = 316 ms
= 54%, BASELINE.md) runs 2*(T-1) = 20 sequential align steps at 240x432
(quarter-res 60x108, C=128). Before designing a Pallas kernel (VERDICT r4
task 1), this splits one step into its parts, each timed as a device loop
(lax.scan with a data-dependent carry, N iterations, one 1-elem sync), so
the kernel targets the true hotspot instead of trace attribution.

Parts:
  offset_convs : the 4-layer conv_offset stack (388->128->128->128->432)
  gathers      : the 36 bilinear corner gathers (9 taps x 4 corners, vmapped
                 over 16 deform groups) of modulated_deform_conv
  tap_matmul   : the (HW, 9*256) @ (9*256, 128) contraction alone
  mdc_full     : modulated_deform_conv end to end
  align_full   : second_order_deform_align end to end
  flow_warp128 : one 128-channel bilinear warp (the cond_n1/cond_n2 cost)
  backbone     : the 2-conv residual backbone of one propagation step

Run: python scripts/exp_deform_anatomy.py [H W C] [N]
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


def device_loop(fn, n):
    """Chain fn n times with a scalar carry perturbation so XLA cannot CSE
    or overlap iterations; returns a jitted runner."""

    @jax.jit
    def run(*args):
        def step(carry, _):
            out = fn(*jax.tree.map(
                lambda a: a + carry.astype(a.dtype) * 0, args))
            leaf = jax.tree.leaves(out)[0]
            return carry + jnp.float32(jnp.sum(leaf.astype(jnp.float32))) * 1e-30, 0

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return c

    return run


def timeit(name, fn, *args, n=20):
    run = device_loop(fn, n)
    np.asarray(run(*args))          # compile+warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:18s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.models.e2fgvi import modules as M
    from vosesam_tpu.models.layers import conv2d

    h = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 108
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    g = 16
    dtype = jnp.float32
    print(f"deform-align anatomy: {h}x{w} C={c} G={g} {dtype.__name__} N={n}")

    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 10)
    p = M.deform_align_init(ks[0], c, g, dtype)
    # make conv_offset.6 nonzero so offsets/mask are realistic, tanh active
    p["conv_offset"]["6"]["weight"] = 0.02 * jax.random.normal(
        ks[1], p["conv_offset"]["6"]["weight"].shape, dtype)

    x = jax.random.normal(ks[2], (1, h, w, 2 * c), dtype)
    extra = jax.random.normal(ks[3], (1, h, w, 3 * c), dtype)
    flow1 = 3.0 * jax.random.normal(ks[4], (1, h, w, 2), dtype)
    flow2 = 3.0 * jax.random.normal(ks[5], (1, h, w, 2), dtype)
    feat = jax.random.normal(ks[6], (h, w, c), dtype)

    # ---- full align ------------------------------------------------------
    timeit("align_full", lambda *a: M.second_order_deform_align(p, *a),
           x, extra, flow1, flow2, n=n)

    # ---- offset conv stack ----------------------------------------------
    def offset_convs(extra, flow1, flow2):
        fin = jnp.concatenate([extra, flow1, flow2], axis=-1)
        co = p["conv_offset"]
        y = M.leaky_relu(conv2d(fin, co["0"], padding=1), 0.1)
        y = M.leaky_relu(conv2d(y, co["2"], padding=1), 0.1)
        y = M.leaky_relu(conv2d(y, co["4"], padding=1), 0.1)
        return conv2d(y, co["6"], padding=1)

    timeit("offset_convs", offset_convs, extra, flow1, flow2, n=n)

    # materialize realistic offset/mask once for the sub-part benches
    out27 = offset_convs(extra, flow1, flow2)
    o1, o2, mask_raw = jnp.split(out27, 3, axis=-1)
    offset = 10.0 * jnp.tanh(jnp.concatenate([o1, o2], -1))
    off1, off2 = jnp.split(offset, 2, axis=-1)
    f1yx = jnp.tile(flow1[..., ::-1], (1, 1, 1, off1.shape[-1] // 2))
    f2yx = jnp.tile(flow2[..., ::-1], (1, 1, 1, off2.shape[-1] // 2))
    offset_all = jnp.concatenate([off1 + f1yx, off2 + f2yx], axis=-1)
    mask = jax.nn.sigmoid(mask_raw)

    # ---- modulated deform conv: full / gathers / matmul ------------------
    timeit("mdc_full",
           lambda *a: M.modulated_deform_conv(*a, p["weight"], p["bias"], g),
           x, offset_all, mask, n=n)

    def gathers_only(x, offset, mask):
        b, hh, ww, cin = x.shape
        cg = cin // g
        off = offset.reshape(b, hh, ww, g, 9, 2)
        m = mask.reshape(b, hh, ww, g, 9)
        acc = jnp.zeros((b, hh, ww, cin), x.dtype)
        idx = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                o = off[:, :, :, :, idx, :]
                fl = jnp.stack([o[..., 1] + dx, o[..., 0] + dy], axis=-1)
                xg = x.reshape(b, hh, ww, g, cg)
                sampled = jax.vmap(
                    lambda xx, ff: M.flow_warp(xx, ff),
                    in_axes=(3, 3), out_axes=3)(xg, fl)
                sampled = sampled * m[:, :, :, :, idx][..., None]
                acc = acc + sampled.reshape(b, hh, ww, cin)
                idx += 1
        return acc

    timeit("gathers_only", gathers_only, x, offset_all, mask, n=n)

    patches = jax.random.normal(ks[7], (1, h, w, 9 * 2 * c), dtype)
    wmat = p["weight"].reshape(9 * 2 * c, -1)

    def tap_matmul(patches):
        return jnp.dot(patches.reshape(1, h, w, 9 * 2 * c), wmat,
                       preferred_element_type=dtype)

    timeit("tap_matmul", tap_matmul, patches, n=n)

    # ---- the other per-step costs ----------------------------------------
    timeit("flow_warp128", lambda a, f: M.flow_warp(a, f[0]), feat, flow1, n=n)

    bb = {
        "0": {"weight": jax.random.normal(ks[8], (3, 3, 3 * c, c), dtype) * 0.02,
              "bias": jnp.zeros((c,), dtype)},
        "2": {"weight": jax.random.normal(ks[9], (3, 3, c, c), dtype) * 0.02,
              "bias": jnp.zeros((c,), dtype)},
    }
    cat = jax.random.normal(ks[7], (h, w, 3 * c), dtype)

    def backbone(cat):
        y = M.leaky_relu(conv2d(cat, bb["0"], padding=1), 0.1)
        return conv2d(y, bb["2"], padding=1)

    timeit("backbone", backbone, cat, n=n)


if __name__ == "__main__":
    main()
