"""LongDataset evaluation driver (reference: run_longdataset_test.ipynb).

Sparse-GT evaluation: metrics only at annotated frame ids; exercises the
long-term memory consolidation + vanishing-mask recovery on 1-3k frame
videos (blueboy / dressage / rat)."""

from __future__ import annotations

import argparse
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vosesam_tpu.config import FrameworkConfig, RefinementConfig, SAMConfig
from vosesam_tpu.eval.datasets import LongVideoDataset
from vosesam_tpu.eval.runner import run_model_on_longdata_set
from vosesam_tpu.pipeline.track_anything import TrackingAnything
from run_davis_test import CONFIGS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="LongDataset root")
    ap.add_argument("--split_file", default="val.txt")
    ap.add_argument("--xmem_checkpoint", default=None)
    ap.add_argument("--sam_checkpoint", default=None)
    ap.add_argument("--sam_model_type", default="vit_h")
    ap.add_argument("--hq", action="store_true")
    ap.add_argument("--configs", nargs="*", default=["baseline", "both_neg_C"])
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--save_masks", action="store_true")
    ap.add_argument("--chunk", type=int, default=None,
                    help="chunked scan + batched-SAM fast path (bit-equal "
                         "masks; K=8 is the measured v5e optimum)")
    ap.add_argument("--batch", action="store_true",
                    help="lockstep batches over the mesh data axis "
                         "(BatchedGenerator; metrics identical to "
                         "sequential, fps = group aggregate)")
    ap.add_argument("--mesh", default=None, metavar="DPxMP",
                    help="data x model mesh shape for --batch, e.g. 4x2")
    args = ap.parse_args()

    dataset = LongVideoDataset(args.root, args.split_file)
    for name in args.configs:
        cfg = FrameworkConfig(
            sam=SAMConfig(model_type=args.sam_model_type, hq=args.hq),
            refinement=CONFIGS[name],
        )
        if args.mesh:
            import dataclasses
            dp, mp = (int(v) for v in args.mesh.split("x"))
            cfg = dataclasses.replace(
                cfg, parallel=dataclasses.replace(
                    cfg.parallel, data_parallel=dp, model_parallel=mp))
        model = TrackingAnything(
            sam_checkpoint=args.sam_checkpoint,
            xmem_checkpoint=args.xmem_checkpoint, cfg=cfg,
        )
        batched = None
        if args.batch:
            from vosesam_tpu.parallel.evaluation import BatchedGenerator
            batched = BatchedGenerator(
                model.xmem_params, model.sam_params, model.cfg,
                chunk=args.chunk or 1)
        runname = f"long_{name}_{uuid.uuid4().hex[:6]}"
        print(f"=== {runname} ===")
        df = run_model_on_longdata_set(
            runname, model, dataset,
            save_masks=args.save_masks, max_videos=args.max_videos,
            chunk=args.chunk, batched=batched,
        )
        print(df[["video", "J_mean", "F_mean", "JF_mean", "fps"]]
              .to_string(index=False))


if __name__ == "__main__":
    main()
