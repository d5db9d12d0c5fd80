"""A/B: device-composite vs host-composite inpaint driver on the real chip.

Times Inpainter.inpaint_efficient wall-clock (the full product path: window
predictions + compositing + result materialization) for one 30-frame subset
at the app's 240x432 setting, device_composite on vs off, same params, both
measured on their second call (first call pays compiles).

Run: python scripts/exp_inpaint_composite_ab.py [T] [H W]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.config import InpainterConfig
    from vosesam_tpu.pipeline.inpaint import Inpainter

    t = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 432

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(t)]
    masks = []
    for _ in range(t):
        m = np.zeros((h, w), np.uint8)
        m[80:150, 150:280] = 1
        masks.append(m)

    base = InpainterConfig()
    dev = Inpainter(cfg=dataclasses.replace(base, device_composite=True))
    host = Inpainter(cfg=dataclasses.replace(base, device_composite=False),
                     params=dev.params)

    results = {}
    for name, inp in (("device", dev), ("host", host)):
        out = inp.inpaint_efficient(frames, masks)   # compile + warm
        t0 = time.perf_counter()
        out = inp.inpaint_efficient(frames, masks)
        dt = time.perf_counter() - t0
        results[name] = (dt, out)
        n_windows = -(-t // base.neighbor_stride)
        print(f"  {name:7s} composite: {dt:7.2f} s for {t} frames "
              f"({n_windows} windows, {dt / n_windows * 1e3:7.0f} ms/window "
              f"incl. transfers+compositing)", flush=True)

    d, hh = results["device"][1], results["host"][1]
    worst = max(
        np.abs(a.astype(np.int32) - b.astype(np.int32)).max()
        for a, b in zip(d, hh))
    print(f"  max |device - host| over all frames: {worst} (uint8 LSBs)")
    print(f"  speedup: {results['host'][0] / results['device'][0]:.2f}x")


if __name__ == "__main__":
    main()
