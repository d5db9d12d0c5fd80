"""On-chip A/B: bounded-window Pallas deform sampler vs the XLA gather path.

Times modulated_deform_conv (shipped, exact, gather-walled at ~16.5 ms) vs
modulated_deform_conv_bounded (ops/pallas/deform_align.py) at the inpaint
propagation shapes, device-loop style, plus a numerical check at small
flows (where the bounded kernel is exact).

Run: python scripts/exp_deform_kernel_ab.py [radius] [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def device_loop(fn, n):
    @jax.jit
    def run(*args):
        def step(carry, _):
            out = fn(*jax.tree.map(
                lambda a: a + carry.astype(a.dtype) * 0, args))
            return carry + jnp.float32(
                jnp.sum(out.astype(jnp.float32))) * 1e-30, 0

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return c

    return run


def timeit(name, fn, *args, n=20):
    run = device_loop(fn, n)
    t0 = time.perf_counter()
    np.asarray(run(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(run(*args))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:26s} {ms:8.3f} ms/iter   (compile+warm {compile_s:.0f}s)",
          flush=True)
    return ms


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.models.e2fgvi import modules as M
    from vosesam_tpu.ops.pallas import deform_align as DA

    radius = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    h, w, g, kt, cin, cout = 60, 108, 16, 9, 256, 128
    print(f"deform kernel A/B: {h}x{w} Cin={cin} G={g} radius={radius} N={n}")

    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 5)
    x = jax.random.normal(ks[0], (1, h, w, cin), jnp.float32)
    resid = 3.0 * jnp.tanh(jax.random.normal(ks[1], (1, h, w, g, kt, 2), jnp.float32))
    flow = 4.0 * jnp.tanh(jax.random.normal(ks[2], (1, h, w, 1, 1, 2), jnp.float32))
    off = (resid + flow).reshape(1, h, w, g * kt * 2)
    mask = jax.nn.sigmoid(jax.random.normal(ks[3], (1, h, w, g * kt), jnp.float32))
    wgt = 0.05 * jax.random.normal(ks[4], (3, 3, cin, cout), jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    # numerics first (flows bounded to 4 + resid 3 + tap 1 + ceil 1 <= 9 < R)
    want = np.asarray(M.modulated_deform_conv(x, off, mask, wgt, bias, g))
    got = np.asarray(DA.modulated_deform_conv_bounded(
        x, off, mask, wgt, bias, g, radius=radius))
    err = np.abs(got - want).max()
    rel = err / (np.abs(want).max() + 1e-9)
    print(f"  in-window max|diff|={err:.2e} (rel {rel:.2e})", flush=True)
    assert rel < 1e-4, "bounded kernel numerics off on-chip"

    timeit("mdc_xla_gather (shipped)",
           lambda *a: M.modulated_deform_conv(*a, wgt, bias, g),
           x, off, mask, n=n)
    timeit(f"mdc_pallas_bounded R={radius}",
           lambda *a: DA.modulated_deform_conv_bounded(
               *a, wgt, bias, g, radius=radius),
           x, off, mask, n=n)


if __name__ == "__main__":
    main()
