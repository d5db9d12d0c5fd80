"""End-to-end evaluation smoke on the REAL TPU chip.

Builds a synthetic DAVIS-2017-format tree at 480p, then drives the full
product path exactly as a user would (pipeline facade -> per-frame tracker
with SAM refinement -> J&F/AP metrics -> CSV ledger + palette PNG masks) on
the default (axon/TPU) platform. CPU CI covers this path at toy sizes
(tests/test_eval.py); this proves the same plumbing on the chip at DAVIS
resolution.

Run: python scripts/tpu_eval_smoke.py [vit_b|vit_l|vit_h] (one TPU process
at a time; vit_b default keeps the remote compile short)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

    from PIL import Image

    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.eval.datasets import DavisDataset
    from vosesam_tpu.eval.palette import save_palette_mask
    from vosesam_tpu.eval.runner import run_model_on_davis_set
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    sam_type = sys.argv[1] if len(sys.argv) > 1 else "vit_b"

    root = "/tmp/davis_smoke"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    videos = ("synth0", "synth1")
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(videos) + "\n")
    h, w = 480, 854
    rng = np.random.default_rng(0)
    for v in videos:
        img_dir = os.path.join(root, "JPEGImages", "480p", v)
        ann_dir = os.path.join(root, "Annotations", "480p", v)
        os.makedirs(img_dir)
        os.makedirs(ann_dir)
        base = rng.integers(0, 255, (h, w, 3), np.uint8)
        for i in range(6):
            # a moving bright square over a fixed background: trackable
            img = base.copy()
            x0 = 150 + 12 * i
            img[100:320, x0:x0 + 250] = (220, 60, 60)
            Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.jpg"))
            m = np.zeros((h, w), np.uint8)
            m[100:320, x0:x0 + 250] = 1
            save_palette_mask(m, os.path.join(ann_dir, f"{i:05d}.png"))

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type=sam_type, hq=True),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    model = TrackingAnything(cfg=cfg, runname="tpu_smoke")
    ds = DavisDataset(root, "2017/val.txt")
    df = run_model_on_davis_set("tpu_smoke", model, ds, compute_metrics=True,
                                save_masks=True)
    show = [c for c in df.columns
            if c not in ("masks", "scores", "per_object", "J_trace", "F_trace")]
    print(df[show].to_string(), flush=True)
    jf = float(df["JF_mean"].mean())
    print(f"JF_mean over {len(df)} synthetic videos: {jf:.4f}")
    assert np.isfinite(jf)
    assert os.path.exists("./result/tpu_smoke/whole_metrics.csv")
    assert os.path.exists("./result/all_tests.csv")
    print("TPU EVAL SMOKE OK")


if __name__ == "__main__":
    main()
