"""LVOS evaluation driver (reference: run_lvos_test.ipynb).

No in-run metrics — palette-PNG masks are saved for the external LVOS
evaluator (runner.py:226-284 semantics)."""

from __future__ import annotations

import argparse
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vosesam_tpu.config import FrameworkConfig, RefinementConfig, SAMConfig
from vosesam_tpu.eval.datasets import LongVideoDataset
from vosesam_tpu.eval.runner import run_model_on_longvos_set
from vosesam_tpu.pipeline.track_anything import TrackingAnything
from run_davis_test import CONFIGS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="LVOS root")
    ap.add_argument("--split_file", default="test.txt")
    ap.add_argument("--xmem_checkpoint", default=None)
    ap.add_argument("--sam_checkpoint", default=None)
    ap.add_argument("--sam_model_type", default="vit_h")
    ap.add_argument("--hq", action="store_true")
    ap.add_argument("--config", default="both_neg_C")
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=None,
                    help="chunked scan + batched-SAM fast path (bit-equal "
                         "masks; K=8 is the measured v5e optimum). With "
                         "--batch, each mesh lane runs the one-jit chunked "
                         "tracker on its own videos (DP x chunked)")
    ap.add_argument("--batch", action="store_true",
                    help="evaluate videos in lockstep batches sharded "
                         "whole-videos-per-device over the mesh data axis "
                         "(parallel/evaluation.py BatchedGenerator — "
                         "BASELINE config 5, 'LVOS batched across a slice')")
    ap.add_argument("--mesh", default=None, metavar="DPxMP",
                    help="data x model mesh shape for --batch, e.g. 4x2 "
                         "(default: all devices on the data axis)")
    args = ap.parse_args()

    dataset = LongVideoDataset(args.root, args.split_file)
    cfg = FrameworkConfig(
        sam=SAMConfig(model_type=args.sam_model_type, hq=args.hq),
        refinement=CONFIGS[args.config],
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
    runname = f"lvos_{args.config}_{uuid.uuid4().hex[:6]}"
    print(f"=== {runname} ===")
    run_model_on_longvos_set(runname, model, dataset,
                             max_videos=args.max_videos, batched=batched,
                             chunk=args.chunk)
    print(f"masks saved under ./result/{runname}/masks/")


if __name__ == "__main__":
    main()
