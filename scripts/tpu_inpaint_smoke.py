"""Inpaint driver smoke on the REAL chip: full sliding-window video path.

Drives pipeline/inpaint.py (subset split, neighbor windows + strided refs,
flip-pad, overlap blending — base_inpainter.py:53-247 semantics) end-to-end
at the app's 240x432 working resolution on the TPU. CPU CI covers this at
toy sizes (tests/test_inpainter.py); this proves the chip path and the
window-jit reuse (one compile, many windows).

Run: python scripts/tpu_inpaint_smoke.py (one TPU process at a time)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from vosesam_tpu.config import InpainterConfig
    from vosesam_tpu.pipeline.inpaint import Inpainter

    t_frames, h, w = 12, 240, 432
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (h, w, 3), np.uint8) for _ in range(t_frames)]
    masks = []
    for i in range(t_frames):
        m = np.zeros((h, w), np.uint8)
        m[80:160, 100 + 4 * i:220 + 4 * i] = 1
        masks.append(m)

    inp = Inpainter(cfg=InpainterConfig())
    t0 = time.time()
    out = inp.inpaint(frames, masks, ratio=1.0)
    dt = time.time() - t0
    out = np.stack(out)
    assert out.shape == (t_frames, h, w, 3), out.shape
    assert out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
    # outside the (dilated) hole, output == input
    eroded_keep = np.ones((h, w), bool)
    eroded_keep[40:200, 60:300] = False     # generous dilation margin
    same = (out[0][eroded_keep] == frames[0][eroded_keep]).mean()
    print(f"inpainted {t_frames} frames {h}x{w} in {dt:.1f}s "
          f"({dt / t_frames * 1e3:.0f} ms/frame); "
          f"outside-hole passthrough: {same:.3f}")
    assert same > 0.99, same
    print("TPU INPAINT SMOKE OK")


if __name__ == "__main__":
    main()
