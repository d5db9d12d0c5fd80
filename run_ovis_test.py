"""OVIS evaluation driver (reference: videoPipeline.ipynb cells 2-3 + 13).

Runs the experiment matrix through the full pipeline against an OVIS-style
annotations JSON (COCO-VIS RLE), writing metric CSVs under
./result/<runname>/ and appending to ./result/all_tests.csv.

Usage:
  python run_ovis_test.py --images_root /path/to/OVIS/train_images \
      --annotations /path/to/OVIS/annotations/annotations_valid.json \
      --xmem_checkpoint XMem-s012.pth --sam_checkpoint sam_vit_h_4b8939.pth \
      [--hq] [--configs baseline both_neg_C ...] [--max_videos N]
"""

from __future__ import annotations

import argparse
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vosesam_tpu.config import FrameworkConfig, SAMConfig
from vosesam_tpu.eval.ovis import OvisDataset, run_model_on_ovis_set
from vosesam_tpu.pipeline.track_anything import TrackingAnything

from run_davis_test import CONFIGS  # the shared experiment matrix


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images_root", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--xmem_checkpoint", default=None)
    ap.add_argument("--sam_checkpoint", default=None)
    ap.add_argument("--sam_model_type", default="vit_h")
    ap.add_argument("--hq", action="store_true", help="SAM-HQ decoder")
    ap.add_argument("--configs", nargs="*", default=["baseline", "both_neg_C"])
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--save_masks", action="store_true")
    ap.add_argument("--chunk", type=int, default=None,
                    help="chunked scan + batched-SAM fast path (bit-equal "
                         "masks; K=8 is the measured v5e optimum)")
    args = ap.parse_args()

    dataset = OvisDataset(args.images_root, args.annotations)
    for name in args.configs:
        cfg = FrameworkConfig(
            sam=SAMConfig(model_type=args.sam_model_type, hq=args.hq),
            refinement=CONFIGS[name],
        )
        model = TrackingAnything(
            sam_checkpoint=args.sam_checkpoint,
            xmem_checkpoint=args.xmem_checkpoint,
            cfg=cfg,
        )
        runname = f"ovis_{name}_{uuid.uuid4().hex[:6]}"
        print(f"=== {runname} ===")
        df = run_model_on_ovis_set(
            runname, model, dataset,
            save_masks=args.save_masks, max_videos=args.max_videos,
            chunk=args.chunk,
        )
        print(df[["video", "J_mean", "F_mean", "JF_mean", "AP", "fps"]]
              .to_string(index=False))


if __name__ == "__main__":
    main()
