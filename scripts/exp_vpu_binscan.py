"""VPU throughput probe for the bounded-window deform-align bin scan.

The candidate Pallas kernel for the inpainter's deform gather replaces the
XLA gather wall (measured ~15 GB/s effective regardless of gather shape,
exp_deform_gather.py) with a dense bin scan: for each of w^2 displacement
bins and 9 taps, build a (P, G) selection weight on the VPU, lane-replicate
to (P, G*cg) and fma into the accumulator. Total ~ w^2 * 9 * HW * 256 fma
per align call (17.3 G at w=34). Whether that beats the 16.2 ms gather
depends ONLY on real VPU fma throughput, which is not public — this probe
measures the exact inner-op shape standalone.

Kernel: grid over P-tiles; per grid step runs BINS iterations of
  wsel = f(iota, fields)    (compare+select on (P, G))
  acc += repeat(wsel, cg) * xtile_shifted
and writes acc. Reported: achieved G fma/s -> projected ms/align at w=34.

Run: python scripts/exp_vpu_binscan.py [P] [BINS]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(p_tile, bins, g, cg, taps):
    cin = g * cg

    def kernel(x_ref, y0_ref, wy_ref, o_ref):
        # x_ref: (P + 128, cin) source rows (pad gives room for shifts)
        # y0_ref: (P, K*G) int32 bin base; wy_ref: (P, K*G) fp32 frac
        # Taps unrolled with STATIC lane slices — Mosaic rejects 3-D vector
        # reshapes ((P, K*G) -> (P, G, K) failed infer-vector-layout).
        acc = jnp.zeros((p_tile, cin), jnp.float32)
        y0 = y0_ref[:]
        wy = wy_ref[:]

        # bins STATICALLY unrolled: a fori_loop shift makes the x load a
        # dynamic unaligned sublane start, which Mosaic rejects
        # (vector.load (512, 256) at dynamic index failed to compile);
        # static offsets lower to plain shifted loads.
        for s in range(bins):
            xs = x_ref[s: s + p_tile, :]                  # shifted rows
            for k in range(taps):
                y0k = y0[:, k * g:(k + 1) * g]            # (P, G)
                wyk = wy[:, k * g:(k + 1) * g]
                w = jnp.where(y0k == s, 1.0 - wyk, 0.0) + jnp.where(
                    y0k == s - 1, wyk, 0.0)               # (P, G)
                wrep = pltpu.repeat(w, cg, 1)             # (P, G*cg)
                acc = acc + wrep * xs
        o_ref[:] = acc

    return kernel


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    p_tile = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bins = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    g, cg, taps = 16, 16, 9
    cin = g * cg
    hw = 6480

    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 3)
    n_tiles = 4
    x = jax.random.normal(ks[0], (n_tiles * p_tile + 128, cin), jnp.float32)
    y0 = jax.random.randint(ks[1], (n_tiles * p_tile, g * taps), 0, bins,
                            dtype=jnp.int32)
    wy = jax.random.uniform(ks[2], (n_tiles * p_tile, g * taps), jnp.float32)

    kern = make_kernel(p_tile, bins, g, cg, taps)
    fn = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((p_tile + 128, cin), lambda i: (i, 0)),
            pl.BlockSpec((p_tile, g * taps), lambda i: (i, 0)),
            pl.BlockSpec((p_tile, g * taps), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((p_tile, cin), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * p_tile, cin), jnp.float32),
    )

    @jax.jit
    def run(x, y0, wy):
        def step(c, _):
            o = fn(x + c * 0, y0, wy)
            return c + jnp.sum(o) * 1e-30, 0

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=10)
        return c

    np.asarray(run(x, y0, wy))
    t0 = time.perf_counter()
    np.asarray(run(x, y0, wy))
    ms = (time.perf_counter() - t0) / 10 * 1e3

    fma = n_tiles * p_tile * bins * cin * taps     # accumulate fma
    sel = n_tiles * p_tile * bins * g * taps * 4   # selection build approx
    print(f"bin-scan tile: P={p_tile} bins={bins} G*K sel + (P,{cin}) fma")
    print(f"  {ms:.3f} ms/iter -> {fma / ms / 1e6:.1f} G fma/s "
          f"(+{sel / ms / 1e6:.1f} G sel-ops/s)")
    # projection to one align call: w=34 -> 1156 bins x 9 taps folded, over
    # HW=6480 pixels: total fma = 1156 * 9-in-sel ... the probe's per-bin
    # work (sel over G*K=144 + one (P, 256) fma) matches the planned kernel
    # shape exactly, so scale by (HW/P') * (1156/bins):
    scale = (hw / (n_tiles * p_tile)) * (1156 / bins)
    print(f"  projected align-call bin-scan time at w=34: {ms * scale:.2f} ms "
          f"(vs 16.2 ms XLA gather)")


if __name__ == "__main__":
    main()
