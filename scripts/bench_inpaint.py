"""E2FGVI-HQ generator on-chip benchmark at reference window sizes.

The inpaint driver (pipeline/inpaint.py, mirroring base_inpainter.py:123-171)
calls the generator once per neighbor window: T = len(neighbors) + len(refs)
frames at the working resolution (240x432 for DAVIS-480p at ratio 0.5 —
the app's default inpaint setting). This measures that hot call.

Run: python scripts/bench_inpaint.py [T] [num_local] [H W]
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

    from vosesam_tpu.config import InpainterConfig
    from vosesam_tpu.models.e2fgvi import generator as G

    t = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    nl = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 432

    cfg = InpainterConfig()
    for dtype in (jnp.float32, jnp.bfloat16):
        params = G.generator_init(jax.random.PRNGKey(0), cfg, dtype=dtype)
        frames = jax.random.uniform(
            jax.random.PRNGKey(1), (t, h, w, 3), dtype, -1.0, 1.0)

        fwd = jax.jit(
            lambda p, f: G.generator_forward(p, f, nl, cfg)[0],
            static_argnames=())
        out = fwd(params, frames)     # compile
        np.asarray(out.ravel()[0:1])  # 1-elem sync: tunnel is ~34 MB/s
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, frames)
        np.asarray(out.ravel()[0:1])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"generator {dtype.__name__} T={t} local={nl} {h}x{w}: "
              f"{ms:8.1f} ms/window  ({ms / t:6.1f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
