"""Per-layer timing of the E2FGVI encoder convs on the real chip, with
alternative lowerings for the grouped layers.

The stage split (exp_inpaint_split.py, 2026-08-17) showed the conv encoder
at 449 ms for T=15 @ 240x432 — ~1.9 effective TFLOPS. This probes where
that goes: each ENC_SPEC layer standalone (device-loop timed), and for the
grouped layers three lowerings:
  fgc   : feature_group_count (the current path)
  split : per-group lax.conv + concat
  dense : one dense conv with a block-diagonal kernel (groups^2/groups more
          FLOPs, but the dense fast path)

Run: python scripts/exp_conv_probe.py [T] [dtype]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vosesam_tpu.models.layers import conv2d, conv_init


ENC_SPEC = [
    (3, 64, 2, 1), (64, 64, 1, 1), (64, 128, 2, 1), (128, 256, 1, 1),
    (256, 384, 1, 1), (640, 512, 1, 2), (768, 384, 1, 4), (640, 256, 1, 8),
    (512, 128, 1, 1),
]


def timeit(name, fn, *args, n=10, flops=None):
    # sync on a 1-element DEVICE-side slice: the tunnel moves ~34 MB/s, so
    # np.asarray(full output) bills seconds of host transfer to the kernel
    out = fn(*args)
    np.asarray(out.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out.ravel()[0:1])
    ms = (time.perf_counter() - t0) / n * 1e3
    tf = f"  {flops / (ms / 1e3) / 1e12:6.2f} TFLOPS" if flops else ""
    print(f"  {name:34s} {ms:8.2f} ms{tf}", flush=True)
    return ms


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    t = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    dtype = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") else jnp.float32
    h, w = 240, 432
    key = jax.random.PRNGKey(0)
    print(f"T={t} {h}x{w} {dtype.__name__}")

    cur_h, cur_w = h, w
    for i, (cin, cout, stride, groups) in enumerate(ENC_SPEC):
        x = 0.1 * jax.random.normal(jax.random.fold_in(key, 100 + i),
                                    (t, cur_h, cur_w, cin), dtype)
        p = conv_init(jax.random.fold_in(key, i), 3, 3, cin // groups, cout,
                      dtype=dtype)
        oh, ow = cur_h // stride, cur_w // stride
        flops = 2 * t * oh * ow * 9 * (cin // groups) * cout
        timeit(f"L{i} {cin}->{cout} s{stride} g{groups} fgc",
               jax.jit(lambda pp, xx, s=stride, g=groups: conv2d(
                   xx, pp, stride=s, padding=1, feature_group_count=g)),
               p, x, flops=flops)

        if groups > 1:
            cg_in, cg_out = cin // groups, cout // groups

            def split_conv(pp, xx, g=groups, s=stride):
                ws = jnp.split(pp["weight"], g, axis=3)
                bs = jnp.split(pp["bias"], g) if "bias" in pp else [None] * g
                xs = jnp.split(xx, g, axis=3)
                outs = []
                for xg, wg, bg in zip(xs, ws, bs):
                    pg = {"weight": wg}
                    if bg is not None:
                        pg["bias"] = bg
                    outs.append(conv2d(xg, pg, stride=s, padding=1))
                return jnp.concatenate(outs, axis=3)
            timeit(f"L{i} split", jax.jit(split_conv), p, x, flops=flops)

            def dense_conv(pp, xx, g=groups, s=stride, ci=cin, co=cout):
                wg = pp["weight"]              # (3, 3, ci/g, co)
                cgi, cgo = ci // g, co // g
                wd = jnp.zeros((3, 3, ci, co), wg.dtype)
                for j in range(g):
                    wd = wd.at[:, :, j * cgi:(j + 1) * cgi,
                               j * cgo:(j + 1) * cgo].set(
                        wg[:, :, :, j * cgo:(j + 1) * cgo])
                pd = {"weight": wd}
                if "bias" in pp:
                    pd = {"weight": wd, "bias": pp["bias"]}
                return conv2d(xx, pd, stride=s, padding=1)
            timeit(f"L{i} dense-blockdiag",
                   jax.jit(dense_conv), p, x,
                   flops=flops)  # honest flops: useful work only
        cur_h, cur_w = oh, ow

    # the full encoder for reference
    from vosesam_tpu.models.e2fgvi import generator as G
    ep = G.encoder_init(key, dtype=dtype)
    x = 0.1 * jax.random.normal(key, (t, h, w, 3), dtype)
    timeit("FULL encoder_forward", jax.jit(G.encoder_forward), ep, x, n=5)


if __name__ == "__main__":
    main()
