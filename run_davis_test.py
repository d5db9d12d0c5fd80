"""DAVIS evaluation driver (reference: run_davis_test.ipynb).

Runs the experiment matrix — dataset x refinement mode x point algorithm x
optimized flag — through the full pipeline, writing metric CSVs under
./result/<runname>/ and appending to the global ./result/all_tests.csv
ledger, exactly like the reference notebook's cell 3.

Usage:
  python run_davis_test.py --davis_root /path/to/DAVIS --year 2017 \
      --xmem_checkpoint XMem-s012.pth --sam_checkpoint sam_vit_h_4b8939.pth \
      [--hq] [--configs baseline both_neg_C ...] [--max_videos N]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vosesam_tpu.config import FrameworkConfig, RefinementConfig, SAMConfig
from vosesam_tpu.eval.datasets import DavisDataset
from vosesam_tpu.eval.runner import run_model_on_davis_set
from vosesam_tpu.pipeline.track_anything import TrackingAnything

# The experiment matrix (reference testList.py:3-16 / notebook cell 3).
CONFIGS = {
    "baseline": RefinementConfig(use_refinement=False),
    "bbox": RefinementConfig(mode="bbox"),
    "point_C": RefinementConfig(mode="point", point_algorithm="C"),
    "both_C": RefinementConfig(mode="both", point_algorithm="C"),
    "both_neg_C": RefinementConfig(mode="both_neg", point_algorithm="C"),
    "both_neg_CP": RefinementConfig(mode="both_neg", point_algorithm="CP"),
    "both_neg_CPS": RefinementConfig(mode="both_neg", point_algorithm="CPS"),
    "both_neg_C_raw": RefinementConfig(mode="both_neg", point_algorithm="C",
                                       optimized=False),
    "mask_bbox_pos_neg": RefinementConfig(mode="mask_bbox_pos_neg"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--davis_root", required=True)
    ap.add_argument("--year", default="2017", choices=["2016", "2017"])
    ap.add_argument("--split", default="val")
    ap.add_argument("--xmem_checkpoint", default=None)
    ap.add_argument("--sam_checkpoint", default=None)
    ap.add_argument("--sam_model_type", default="vit_h")
    ap.add_argument("--hq", action="store_true", help="SAM-HQ decoder")
    ap.add_argument("--configs", nargs="*", default=["baseline", "both_neg_C"])
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--save_masks", action="store_true")
    ap.add_argument("--chunk", type=int, default=None,
                    help="route propagation through the chunked scan + "
                         "batched-SAM fast path (bit-equal masks, "
                         "tests/test_chunked.py; the bench.py headline "
                         "program) with this chunk size — K=8 is the "
                         "measured optimum on v5e")
    ap.add_argument("--batch", action="store_true",
                    help="evaluate videos in lockstep batches sharded "
                         "whole-videos-per-device over the mesh data axis "
                         "(BatchedGenerator; metrics identical to "
                         "sequential, fps = group aggregate)")
    ap.add_argument("--mesh", default=None, metavar="DPxMP",
                    help="data x model mesh shape for --batch, e.g. 4x2 "
                         "(default: all devices on the data axis)")
    args = ap.parse_args()

    dataset = DavisDataset(
        args.davis_root, f"{args.year}/{args.split}.txt",
        single_object=args.year == "2016",
    )
    for name in args.configs:
        rcfg = CONFIGS[name]
        cfg = FrameworkConfig(
            sam=SAMConfig(model_type=args.sam_model_type, hq=args.hq),
            refinement=rcfg,
        )
        if args.mesh:
            dp, mp = (int(v) for v in args.mesh.split("x"))
            cfg = dataclasses.replace(
                cfg, parallel=dataclasses.replace(
                    cfg.parallel, data_parallel=dp, model_parallel=mp))
        model = TrackingAnything(
            sam_checkpoint=args.sam_checkpoint,
            xmem_checkpoint=args.xmem_checkpoint,
            cfg=cfg,
        )
        batched = None
        if args.batch:
            from vosesam_tpu.parallel.evaluation import BatchedGenerator
            batched = BatchedGenerator(
                model.xmem_params, model.sam_params, model.cfg,
                chunk=args.chunk or 1)
        runname = f"davis{args.year}_{name}_{uuid.uuid4().hex[:6]}"
        print(f"=== {runname} ===")
        df = run_model_on_davis_set(
            runname, model, dataset,
            save_masks=args.save_masks, max_videos=args.max_videos,
            chunk=args.chunk, batched=batched,
        )
        print(df[["video", "J_mean", "F_mean", "JF_mean", "AP", "fps"]]
              .to_string(index=False))


if __name__ == "__main__":
    main()
