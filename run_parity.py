"""One-command J&F parity runner for the five BASELINE configs.

The day real checkpoints + datasets are available, the entire pending half of
BASELINE.md ("To be measured" table) is one command:

  python run_parity.py --checkpoints /path/to/ckpts --data /path/to/data \
      [--reference_csv ref_results.csv] [--max_videos N] [--out result/parity]

Expected layout (any subset; configs whose inputs are missing are SKIPPED
with a clear report, never an error):

  checkpoints/
    XMem-s012.pth                      (tracker/model/network.py:184)
    sam_vit_h_4b8939.pth               (tools/base_segmenter.py:25)
    sam_hq_vit_h.pth                   (HQ venv variant, README.md:93-131)
  data/
    DAVIS/                             (JPEGImages/480p, Annotations/480p,
                                        ImageSets/2016|2017)
    LongDataset/                       (blueboy/dressage/rat, sparse GT)
    LVOS/                              (valid_set layout)
    test_sample/test-sample*.mp4       (reference repo's demo clips)

The five configs (BASELINE.json):
  1. DAVIS-2016 `bear` 480p, XMem-only propagation
  2. test_sample mp4, full XMem -> SAM ViT-H point-prompt loop (fps only —
     the clip has no GT)
  3. DAVIS-2017 val multi-object, per-object memory + SAM-HQ ViT-H
  4. LongDataset (blueboy/dressage/rat), long-term consolidation
  5. LVOS val (batched eval; masks saved, J&F if annotations present)

With --reference_csv (a CSV bearing `config,J_mean,F_mean,JF_mean` rows from
running the reference repo's runner.py on the same data), the report gains
delta columns and flags |dJF| > 0.2 (the BASELINE target).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _exists(*parts) -> str | None:
    p = os.path.join(*[x for x in parts if x])
    return p if os.path.exists(p) else None


def _report_row(rows, config, df=None, fps=None, note=""):
    row = {"config": config, "J_mean": None, "F_mean": None, "JF_mean": None,
           "fps": fps, "note": note}
    if df is not None and len(df):
        row["J_mean"] = float(df["J_mean"].mean())
        row["F_mean"] = float(df["F_mean"].mean())
        row["JF_mean"] = float(df["JF_mean"].mean())
        if "fps" in df and fps is None:
            row["fps"] = float(df["fps"].mean())
    rows.append(row)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--reference_csv", default=None)
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--out", default=os.path.join("result", "parity"))
    ap.add_argument("--configs", nargs="*", type=int, default=[1, 2, 3, 4, 5],
                    help="subset of the five BASELINE config numbers")
    ap.add_argument("--encode", default="official",
                    help="SAM encode geometry for ALL configs: 'official' "
                         "(1024 square, the reference's exact behavior), "
                         "'rect' (encode_rect fast path), or 'letterbox:HxW'"
                         " e.g. letterbox:448x896 — run this to measure the "
                         "fast gear's J&F delta the day checkpoints exist")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig,
    )

    enc_kw = {}
    if args.encode == "rect":
        enc_kw = {"encode_rect": True}
    elif args.encode.startswith("letterbox:"):
        hw = tuple(int(v) for v in args.encode.split(":")[1].split("x"))
        enc_kw = {"encode_letterbox_hw": hw}
    elif args.encode != "official":
        raise SystemExit(f"unknown --encode {args.encode!r}")

    def mk_sam(**kw) -> SAMConfig:
        return SAMConfig(**kw, **enc_kw)
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    ck = args.checkpoints
    xmem_ck = _exists(ck, "XMem-s012.pth")
    sam_ck = _exists(ck, "sam_vit_h_4b8939.pth")
    samhq_ck = _exists(ck, "sam_hq_vit_h.pth")
    davis = _exists(args.data, "DAVIS")
    longd = _exists(args.data, "LongDataset")
    lvos = _exists(args.data, "LVOS")
    sample = None
    sdir = _exists(args.data, "test_sample")
    if sdir:
        mp4s = sorted(f for f in os.listdir(sdir) if f.endswith(".mp4"))
        sample = os.path.join(sdir, mp4s[0]) if mp4s else None

    print(f"checkpoints: xmem={xmem_ck} sam={sam_ck} sam_hq={samhq_ck}")
    print(f"data: davis={davis} long={longd} lvos={lvos} sample={sample}")

    rows: list[dict] = []

    # ---- 1. DAVIS-2016 bear, XMem-only ----------------------------------
    if 1 in args.configs:
        if xmem_ck and davis:
            from vosesam_tpu.eval.datasets import DavisDataset
            from vosesam_tpu.eval.runner import run_model_on_davis_set

            ds = DavisDataset(davis, "2016/val.txt", single_object=True)
            ds.videos = [v for v in ds.videos if v == "bear"] or ds.videos[:1]
            model = TrackingAnything(
                xmem_checkpoint=xmem_ck,
                cfg=FrameworkConfig(
                    refinement=RefinementConfig(use_refinement=False)),
            )
            df = run_model_on_davis_set("parity1_bear_xmem", model, ds,
                                        max_videos=1)
            _report_row(rows, "1_davis2016_bear_xmem_only", df)
        else:
            _report_row(rows, "1_davis2016_bear_xmem_only",
                        note="SKIP: needs XMem-s012.pth + DAVIS")

    # ---- 2. test_sample mp4, full refinement loop -----------------------
    if 2 in args.configs:
        if xmem_ck and sam_ck and sample:
            import numpy as np

            from vosesam_tpu.eval.palette import save_palette_mask
            from vosesam_tpu.eval.video_io import read_video_frames

            model = TrackingAnything(
                xmem_checkpoint=xmem_ck, sam_checkpoint=sam_ck,
                cfg=FrameworkConfig(
                    sam=mk_sam(model_type="vit_h"),
                    refinement=RefinementConfig(mode="both_neg",
                                                point_algorithm="C")),
            )
            frames = read_video_frames(sample)
            # seed with a centered synthetic box prompt -> SAM mask, as the
            # demo does with a first-frame click
            h, w = frames[0].shape[:2]
            mask, _lg, _p = model.samcontroler.first_frame_click(
                frames[0], np.asarray([[w // 2, h // 2]]),
                np.asarray([1]), multimask=True)
            t0 = time.time()
            masks, _logits, _painted, _scores = model.generator(
                frames, template_mask=mask.astype(np.uint8))
            fps = len(frames) / (time.time() - t0)
            outd = os.path.join(args.out, "sample_masks")
            os.makedirs(outd, exist_ok=True)
            for i, m in enumerate(masks[:20]):
                save_palette_mask(m, os.path.join(outd, f"{i:05d}.png"))
            _report_row(rows, "2_test_sample_full_loop", fps=round(fps, 2),
                        note="no GT in clip; masks saved")
        else:
            _report_row(rows, "2_test_sample_full_loop",
                        note="SKIP: needs XMem + SAM ckpt + test_sample mp4")

    # ---- 3. DAVIS-2017 val, SAM-HQ ViT-H --------------------------------
    if 3 in args.configs:
        if xmem_ck and samhq_ck and davis:
            from vosesam_tpu.eval.datasets import DavisDataset
            from vosesam_tpu.eval.runner import run_model_on_davis_set

            ds = DavisDataset(davis, "2017/val.txt", single_object=False)
            model = TrackingAnything(
                xmem_checkpoint=xmem_ck, sam_checkpoint=samhq_ck,
                cfg=FrameworkConfig(
                    sam=mk_sam(model_type="vit_h", hq=True),
                    refinement=RefinementConfig(mode="both_neg",
                                                point_algorithm="C",
                                                optimized=True)),
            )
            df = run_model_on_davis_set("parity3_d17_hq", model, ds,
                                        max_videos=args.max_videos)
            _report_row(rows, "3_davis2017_val_samhq", df)
        else:
            _report_row(rows, "3_davis2017_val_samhq",
                        note="SKIP: needs XMem + sam_hq ckpt + DAVIS")

    # ---- 4. LongDataset -------------------------------------------------
    if 4 in args.configs:
        if xmem_ck and samhq_ck and longd:
            from vosesam_tpu.eval.datasets import LongVideoDataset
            from vosesam_tpu.eval.runner import run_model_on_longdata_set

            ds = LongVideoDataset(longd)
            model = TrackingAnything(
                xmem_checkpoint=xmem_ck, sam_checkpoint=samhq_ck,
                cfg=FrameworkConfig(
                    sam=mk_sam(model_type="vit_h", hq=True),
                    refinement=RefinementConfig(mode="both_neg")),
            )
            df = run_model_on_longdata_set("parity4_long", model, ds,
                                           max_videos=args.max_videos)
            _report_row(rows, "4_longdataset_consolidation", df)
        else:
            _report_row(rows, "4_longdataset_consolidation",
                        note="SKIP: needs XMem + sam_hq ckpt + LongDataset")

    # ---- 5. LVOS --------------------------------------------------------
    if 5 in args.configs:
        if xmem_ck and samhq_ck and lvos:
            from vosesam_tpu.eval.datasets import LongVideoDataset
            from vosesam_tpu.eval.runner import run_model_on_longvos_set

            ds = LongVideoDataset(lvos)
            model = TrackingAnything(
                xmem_checkpoint=xmem_ck, sam_checkpoint=samhq_ck,
                cfg=FrameworkConfig(
                    sam=mk_sam(model_type="vit_h", hq=True),
                    refinement=RefinementConfig(mode="both_neg")),
            )
            df = run_model_on_longvos_set("parity5_lvos", model, ds,
                                          max_videos=args.max_videos)
            _report_row(rows, "5_lvos_val", df,
                        note="masks saved; J&F where GT present")
        else:
            _report_row(rows, "5_lvos_val",
                        note="SKIP: needs XMem + sam_hq ckpt + LVOS")

    # ---- report ---------------------------------------------------------
    ref = {}
    if args.reference_csv and os.path.exists(args.reference_csv):
        import csv

        with open(args.reference_csv) as f:
            for r in csv.DictReader(f):
                ref[r["config"]] = r

    print("\n===== PARITY REPORT =====")
    hdr = f"{'config':36s} {'J':>7s} {'F':>7s} {'J&F':>7s} {'fps':>7s}"
    if ref:
        hdr += f" {'dJ&F':>7s} {'ok?':>4s}"
    print(hdr)
    for row in rows:
        jf = row["JF_mean"]
        line = (f"{row['config']:36s} "
                f"{row['J_mean'] if row['J_mean'] is not None else '—':>7} "
                f"{row['F_mean'] if row['F_mean'] is not None else '—':>7} "
                f"{jf if jf is not None else '—':>7} "
                f"{row['fps'] if row['fps'] is not None else '—':>7}")
        if ref and row["config"] in ref and jf is not None:
            d = jf - float(ref[row["config"]]["JF_mean"])
            line += f" {d:+7.3f} {'OK' if abs(d) <= 0.2 else 'FAIL':>4s}"
            row["dJF"] = d
        if row["note"]:
            line += f"   [{row['note']}]"
        print(line)

    with open(os.path.join(args.out, "parity_report.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\nwritten: {os.path.join(args.out, 'parity_report.json')}")


if __name__ == "__main__":
    main()
