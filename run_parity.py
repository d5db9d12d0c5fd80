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


# ------------------------------------------------------------- --synthetic
# Tiny-scale stand-ins proving the harness executes end-to-end TODAY: real
# .pth files in the official schemas (utils/checkpoint.py round-trip) at toy
# dims, and generated dataset trees in the exact layouts the loaders expect.
# The day real artifacts arrive, the same code paths run at full scale.

_SYN_HW = (32, 48)
_SYN_VIT = (("vit_h", 64, 2, 2, (1,)),)   # tiny vit_h: 64-wide, 2 blocks

_CONVT_MARKERS = (
    "output_upscaling.0.weight", "output_upscaling.3.weight",
    "compress_vit_feat.0.weight", "compress_vit_feat.3.weight",
    "embedding_encoder.0.weight", "embedding_encoder.3.weight",
)


def _syn_checkpoints(ck: str, sam_cfg, samhq_cfg) -> None:
    import jax
    import numpy as np
    import torch

    from vosesam_tpu.config import XMemConfig
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet
    from vosesam_tpu.utils import checkpoint as ckpt

    os.makedirs(ck, exist_ok=True)

    xcfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=4, max_objects=2)
    tree = jax.tree.map(np.asarray, xnet.xmem_init(jax.random.PRNGKey(0), xcfg))
    sd = ckpt.tree_to_state_dict(
        tree, renames={"key_encoder.layer1.": "key_encoder.res2."})
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               os.path.join(ck, "XMem-s012.pth"))

    for fname, cfg in (("sam_vit_h_4b8939.pth", sam_cfg),
                       ("sam_hq_vit_h.pth", samhq_cfg)):
        sp = predictor.sam_init(jax.random.PRNGKey(1), cfg)
        tree = jax.tree.map(np.asarray, {
            "image_encoder": sp.image_encoder,
            "prompt_encoder": sp.prompt_encoder,
            "mask_decoder": sp.mask_decoder,
        })
        shapes = ckpt.tree_shapes(tree)
        convt = {k: "conv_transpose" for k in shapes
                 if any(s in k for s in _CONVT_MARKERS)}
        sd = ckpt.tree_to_state_dict(tree, transpose_spec=convt)
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
                   os.path.join(ck, fname))


def _syn_data(data: str) -> None:
    import numpy as np
    from PIL import Image

    from vosesam_tpu.eval.palette import save_palette_mask
    from vosesam_tpu.eval.video_io import write_video

    h, w = _SYN_HW
    rng = np.random.default_rng(0)

    def frame(i, two_objects=False):
        f = rng.integers(0, 255, (h, w, 3), np.uint8)
        f[8 + i:20 + i, 10 + i:26 + i] = [255, 40, 40]
        if two_objects:
            f[22:30, 30 + i:44 + i] = [40, 255, 40]
        return f

    def mask(i, two_objects=False):
        m = np.zeros((h, w), np.uint8)
        m[8 + i:20 + i, 10 + i:26 + i] = 1
        if two_objects:
            m[22:30, 30 + i:44 + i] = 2
        return m

    # DAVIS: 2016 bear (single-object) + 2017 val (multi-object)
    davis = os.path.join(data, "DAVIS")
    os.makedirs(os.path.join(davis, "ImageSets", "2016"), exist_ok=True)
    os.makedirs(os.path.join(davis, "ImageSets", "2017"), exist_ok=True)
    with open(os.path.join(davis, "ImageSets", "2016", "val.txt"), "w") as f:
        f.write("bear\n")
    with open(os.path.join(davis, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("bike-packing\n")
    for video, two in (("bear", False), ("bike-packing", True)):
        img_dir = os.path.join(davis, "JPEGImages", "480p", video)
        ann_dir = os.path.join(davis, "Annotations", "480p", video)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i in range(3):
            Image.fromarray(frame(i, two)).save(
                os.path.join(img_dir, f"{i:05d}.jpg"))
            save_palette_mask(mask(i, two),
                              os.path.join(ann_dir, f"{i:05d}.png"))

    # LongDataset / LVOS: JPEGImages/<video>/ + sparse Annotations
    for name, gt_ids, n in (("LongDataset", (0, 2), 4), ("LVOS", (0,), 3)):
        img_dir = os.path.join(data, name, "JPEGImages", "clip")
        ann_dir = os.path.join(data, name, "Annotations", "clip")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i in range(n):
            Image.fromarray(frame(i)).save(
                os.path.join(img_dir, f"{i:05d}.jpg"))
        for i in gt_ids:
            save_palette_mask(mask(i),
                              os.path.join(ann_dir, f"{i:05d}.png"))

    # test_sample mp4
    sdir = os.path.join(data, "test_sample")
    os.makedirs(sdir, exist_ok=True)
    write_video(os.path.join(sdir, "test-sample2.mp4"),
                [frame(i) for i in range(4)], fps=10)


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
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="prove the harness end-to-end TODAY: synthesize "
                         "tiny official-schema .pth checkpoints + dataset "
                         "trees (under --out) for any artifact not supplied "
                         "and run all five configs at toy scale on the "
                         "default backend")
    ap.add_argument("--reference_csv", default=None)
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--out", default=os.path.join("result", "parity"))
    ap.add_argument("--configs", nargs="*", type=int, default=[1, 2, 3, 4, 5],
                    help="subset of the five BASELINE config numbers")
    ap.add_argument("--platform", default="default",
                    choices=("default", "cpu"),
                    help="'cpu' forces the JAX CPU backend (the axon site "
                         "hook pins JAX_PLATFORMS=axon at interpreter start; "
                         "env vars cannot override it, only this in-process "
                         "config switch can) — used by the test gate to run "
                         "the synthetic rows off-chip")
    ap.add_argument("--chunk", type=int, default=None,
                    help="route configs 1-4 through the chunked scan + "
                         "batched-SAM fast path (bit-equal masks, "
                         "tests/test_chunked.py — the program behind the "
                         "bench.py headline, so the parity fps column "
                         "measures what bench.py measures). K=8 is the "
                         "measured v5e optimum")
    ap.add_argument("--batch", action="store_true",
                    help="run the dataset configs (1, 3, 4, 5) through the "
                         "BatchedGenerator (videos sharded whole-per-device "
                         "over the mesh data axis; metrics identical to "
                         "sequential — tests/test_eval.py — fps becomes the "
                         "group aggregate rate)")
    ap.add_argument("--encode", default="official",
                    help="SAM encode geometry for ALL configs: 'official' "
                         "(1024 square, the reference's exact behavior), "
                         "'rect' (encode_rect fast path), or 'letterbox:HxW'"
                         " e.g. letterbox:448x896 — run this to measure the "
                         "fast gear's J&F delta the day checkpoints exist")
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache:
            jax.config.update("jax_compilation_cache_dir", cache)
    os.makedirs(args.out, exist_ok=True)
    if not args.synthetic and (not args.checkpoints or not args.data):
        ap.error("--checkpoints and --data are required (or use --synthetic)")

    from vosesam_tpu.config import (
        FrameworkConfig as _FrameworkConfig, MemoryConfig, RefinementConfig,
        SAMConfig,
    )

    enc_kw = {}
    if args.encode == "rect":
        enc_kw = {"encode_rect": True}
    elif args.encode.startswith("letterbox:"):
        hw = tuple(int(v) for v in args.encode.split(":")[1].split("x"))
        enc_kw = {"encode_letterbox_hw": hw}
    elif args.encode != "official":
        raise SystemExit(f"unknown --encode {args.encode!r}")

    syn_kw = dict(image_size=128, window_size=7, vit_dims=_SYN_VIT)

    def mk_sam(**kw) -> SAMConfig:
        if args.synthetic:
            kw.update(syn_kw)
        return SAMConfig(**kw, **enc_kw)

    def FrameworkConfig(**kw) -> _FrameworkConfig:
        cfg = _FrameworkConfig(**kw)
        if args.synthetic:   # toy-scale memory + CPU-friendly dtype
            cfg = dataclasses.replace(
                cfg,
                memory=MemoryConfig(
                    max_mid_term_frames=3, min_mid_term_frames=2,
                    max_long_term_elements=64, num_prototypes=8, top_k=8,
                    mem_every=2),
                dtype="float32")
        return cfg

    if args.synthetic:
        if not args.checkpoints:
            args.checkpoints = os.path.join(args.out, "synthetic", "checkpoints")
            _syn_checkpoints(args.checkpoints,
                             mk_sam(model_type="vit_h"),
                             mk_sam(model_type="vit_h", hq=True))
        if not args.data:
            args.data = os.path.join(args.out, "synthetic", "data")
            _syn_data(args.data)

    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    def mk_batched(model):
        if not args.batch:
            return None
        from vosesam_tpu.parallel.evaluation import BatchedGenerator

        return BatchedGenerator(model.xmem_params, model.sam_params,
                                model.cfg, chunk=args.chunk or 1)

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
        # .mp4 preferred; .gif accepted (write_video's no-ffmpeg fallback
        # suffixes .mp4.gif — the synthetic tree uses it on ffmpeg-less hosts)
        clips = sorted(f for f in os.listdir(sdir)
                       if f.endswith((".mp4", ".gif")))
        clips.sort(key=lambda f: (not f.endswith(".mp4"), f))
        sample = os.path.join(sdir, clips[0]) if clips else None

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
                                        max_videos=1, chunk=args.chunk,
                                        batched=mk_batched(model))
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
            if args.chunk:
                masks, _scores = model.generator_chunked(
                    frames, template_mask=mask.astype(np.uint8),
                    chunk=args.chunk)
            else:
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
                                        max_videos=args.max_videos,
                                        chunk=args.chunk,
                                        batched=mk_batched(model))
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
                                           max_videos=args.max_videos,
                                           chunk=args.chunk,
                                           batched=mk_batched(model))
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
            batched = None
            if args.batch:
                from vosesam_tpu.parallel.evaluation import BatchedGenerator
                batched = BatchedGenerator(
                    model.xmem_params, model.sam_params, model.cfg,
                    chunk=args.chunk or 1)
            df = run_model_on_longvos_set("parity5_lvos", model, ds,
                                          max_videos=args.max_videos,
                                          batched=batched, chunk=args.chunk)
            _report_row(rows, "5_lvos_val", df,
                        note="masks saved; J&F where GT present"
                             + ("; batched over mesh" if args.batch else ""))
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
