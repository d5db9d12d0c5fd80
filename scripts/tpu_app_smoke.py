"""Interactive-app user path on the REAL chip.

Drives the UI-free AppSession exactly as the Gradio callbacks do
(app.py:404-598 reference flow): load synthetic frames -> select template
(SAM embed) -> positive + negative clicks (two-pass first_frame_click) ->
add mask -> track with refinement -> inpaint the tracked object. CPU CI
covers this path (tests/test_app_server.py); this proves it on the TPU.

Run: python scripts/tpu_app_smoke.py (one TPU process at a time)
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

    from app import AppSession
    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type="vit_b", hq=True),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    model = TrackingAnything(cfg=cfg)
    s = AppSession(model)

    t_all = time.time()
    h, w = 480, 854
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    s.frames = []
    for i in range(5):
        f = base.copy()
        x0 = 150 + 15 * i
        f[100:320, x0:x0 + 250] = (210, 70, 50)
        s.frames.append(f)

    t0 = time.time()
    tpl = s.select_template(0)
    assert tpl.shape == (h, w, 3)
    painted = s.click(275.0, 210.0, positive=True)     # inside the square
    painted = s.click(700.0, 420.0, positive=False)    # background
    assert painted.shape == (h, w, 3)
    assert s.current_mask is not None and s.current_mask.any()
    mask_px = int(s.current_mask.sum())
    n = s.add_mask()        # saves current_mask into the multi-mask list
    assert n == 1
    print(f"click+refine: {time.time() - t0:.1f}s (mask px: {mask_px})",
          flush=True)

    t0 = time.time()
    masks, painted_frames, scores = s.track()
    assert len(masks) == 5 and masks[0].shape == (h, w)
    assert all(np.isfinite(np.asarray(sc)).all() for sc in scores)
    assert masks[0].any()      # frame 0 carries the template mask
    print(f"track 5 frames: {time.time() - t0:.1f}s; "
          f"mask px/frame: {[int(m.sum()) for m in masks]}", flush=True)

    s.resize_ratio = 0.5
    t0 = time.time()
    out = s.inpaint(masks)
    assert len(out) == 5 and out[0].shape[2] == 3
    print(f"inpaint 5 frames (ratio 0.5): {time.time() - t0:.1f}s", flush=True)
    # The product-loop wall-clock (incl. first-touch compiles unless the
    # persistent cache is warm) — recorded in BASELINE.md "Other measured
    # components" so the interactive path has an on-chip number, not just
    # the bench loop (VERDICT r3 task 7).
    print(f"TPU APP SMOKE OK — total wall-clock "
          f"{time.time() - t_all:.1f}s (template+clicks -> track -> inpaint)",
          flush=True)


if __name__ == "__main__":
    main()
