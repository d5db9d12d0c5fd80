"""A/B: exact (erf) vs tanh-approx GELU in the ViT MLP at bench shapes.

The MLP towers apply gelu to (K*2304, 5120) bf16 ~32 times per frame
(378M activations); erf upcasts to f32 internally. If the VPU erf chain
is a meaningful slice of the 40.5 ms encode, the tanh approximation
(max |diff| ~3e-3 in activation units, inside bf16 rounding noise) may be
worth an opt-in config knob. Measure before deciding.

Run: python scripts/exp_gelu.py  (one TPU process at a time)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    K, N, D, H = 8, 2304, 1280, 5120
    BLOCKS = 32
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(r[0], (K * N, D), jnp.bfloat16)
    w1 = jax.random.normal(r[1], (D, H), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(r[2], (H, D), jnp.bfloat16) * 0.02

    def tower(x, act):
        def step(carry, _):
            y = jnp.dot(carry, w1, preferred_element_type=carry.dtype)
            y = act(y)
            y = jnp.dot(y, w2, preferred_element_type=carry.dtype)
            return carry + y * 1e-3, 0
        c, _ = jax.lax.scan(step, x, None, length=BLOCKS)
        return c

    acts = {
        "erf gelu (shipped)": lambda y: jax.nn.gelu(
            y, approximate=False).astype(y.dtype),
        "tanh gelu": lambda y: jax.nn.gelu(
            y, approximate=True).astype(y.dtype),
        "no act (floor)": lambda y: y,
    }
    outs = {}
    for name, act in acts.items():
        f = jax.jit(lambda x, _a=act: tower(x, _a))
        out = f(x)
        np.asarray(out.ravel()[0:1])
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(x)
        np.asarray(out.ravel()[0:1])
        ms = (time.perf_counter() - t0) / n * 1e3
        outs[name] = np.asarray(out, np.float32)
        print(f"{name:22s}: {ms / K:7.3f} ms/frame for {BLOCKS} MLPs",
              flush=True)
    d = np.abs(outs["erf gelu (shipped)"] - outs["tanh gelu"]).max()
    print(f"max |erf - tanh| after {BLOCKS} blocks: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
