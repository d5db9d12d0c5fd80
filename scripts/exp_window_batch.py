"""A/B: batch B independent inpaint windows through ONE generator call.

Under InpainterConfig.static_windows every window of a subset has the same
(T, num_local, H, W) signature and reads only the shared padded video —
windows are independent until host-side compositing. vmapping B windows
multiplies every op in the T-step propagation chain (the 54%-of-584ms stage,
BASELINE.md) by B: same sequential depth, B-x larger convs/gathers per step,
B-x fewer kernel launches — the classic throughput trade on this chip where
small ops realize a fraction of peak.

Run: python scripts/exp_window_batch.py [T] [num_local] [H W]
Prints ms/window at B=1 (the shipped path) and B=2/4 vmapped.
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
    params = G.generator_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    for b in (1, 2, 4):
        frames = jax.random.uniform(
            jax.random.PRNGKey(1), (b, t, h, w, 3), jnp.float32, -1.0, 1.0)
        if b == 1:
            fwd = jax.jit(lambda p, f: G.generator_forward(p, f[0], nl, cfg)[0])
        else:
            fwd = jax.jit(lambda p, f: jax.vmap(
                lambda ff: G.generator_forward(p, ff, nl, cfg)[0])(f))
        try:
            out = fwd(params, frames)
        except Exception as e:  # OOM etc — record and continue
            print(f"B={b}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        np.asarray(out.ravel()[0:1])
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, frames)
        np.asarray(out.ravel()[0:1])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"B={b} T={t} local={nl} {h}x{w}: {ms:8.1f} ms/call "
              f"({ms / b:7.1f} ms/window, {ms / b / t:6.1f} ms/frame)",
              flush=True)


if __name__ == "__main__":
    main()
