"""Per-dataset evaluation drivers.

Reference: tools/runner.py — run_model_on_davis_set (:13-124),
run_model_on_longdata_set (:127-223, metrics only at annotated frame ids),
run_model_on_longVOS_set (:226-284, masks/videos saved for external eval).
Common protocol per video: clear tracker memory, run the generator, compute
J&F + AP, append CSV rows (whole_metrics.csv / per_object_metrics.csv /
global all_tests.csv ledger :11,104-122), optionally dump palette PNGs and
an mp4."""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from vosesam_tpu.eval import metrics as M
from vosesam_tpu.eval.datasets import DavisDataset, LongVideoDataset
from vosesam_tpu.eval.palette import save_palette_mask

ALL_TESTS_CSV = "./result/all_tests.csv"


def _result_dir(runname: str) -> str:
    d = os.path.join("./result", runname)
    os.makedirs(d, exist_ok=True)
    return d


def _append_global_ledger(row: Dict) -> None:
    os.makedirs(os.path.dirname(ALL_TESTS_CSV), exist_ok=True)
    df = pd.DataFrame([row])
    header = not os.path.exists(ALL_TESTS_CSV)
    df.to_csv(ALL_TESTS_CSV, mode="a", header=header, index=False)


def _eval_one_video(
    model, frames: List[np.ndarray], template_mask: np.ndarray,
    gt_masks: List[Optional[np.ndarray]],
    chunk: Optional[int] = None,
) -> Dict:
    """`chunk`: route propagation through the measured-fastest
    generator_chunked path (bit-equal masks, tests/test_chunked.py) —
    the program behind the bench.py headline. None = per-frame generator
    (the reference's track_anything.py:56-81 analogue)."""
    model.xmem.clear_memory()
    t0 = time.time()
    if chunk:
        masks, scores = model.generator_chunked(frames, template_mask,
                                                chunk=chunk)
    else:
        masks, logits, painted, scores = model.generator(frames, template_mask)
    dt = time.time() - t0
    # Scores are ordered by the tracker's *remapped* contiguous slots
    # (utils/mask_mapper.py); GT palettes may be non-contiguous (e.g. {0,3,7}).
    # Capture the original-label -> slot map before clear_memory wipes it.
    remappings: Dict[int, int] = dict(
        getattr(getattr(model.xmem, "mapper", None), "remappings", None) or {}
    )
    model.xmem.clear_memory()

    def _score_map(frame_scores) -> Dict[int, float]:
        if remappings:
            return {
                orig: (frame_scores[slot - 1] if slot - 1 < len(frame_scores) else 0.0)
                for orig, slot in remappings.items()
            }
        # No mapper (mock models in tests): assume contiguous labels.
        return {l + 1: s for l, s in enumerate(frame_scores)}

    return _metrics_from_masks(
        masks, gt_masks, [_score_map(s) for s in scores],
        fps=len(frames) / dt if dt > 0 else 0.0, scores=scores)


def _metrics_from_masks(
    masks: List[np.ndarray], gt_masks: List[Optional[np.ndarray]],
    label_scores: List[Dict[int, float]], fps: float, scores=None,
) -> Dict:
    """J&F/AP for one video from PRECOMPUTED masks (the sequential path's
    generator output or a BatchedGenerator lane). `label_scores`: per-frame
    {original-palette-label: confidence} maps for AP."""
    video_metrics = M.compute_all_video_metrics(masks, gt_masks)
    ap_rows: List[dict] = []
    for i, gt in enumerate(gt_masks):
        if gt is None or i == 0:
            continue
        ap_rows.extend(M.true_positives(masks[i], gt, label_scores[i]))
    video_metrics.update(M.calculate_video_AP(ap_rows))
    video_metrics["fps"] = fps
    video_metrics["masks"] = masks
    video_metrics["scores"] = scores if scores is not None else label_scores
    return video_metrics


def _batched_group_metrics(batched, group_frames, group_templates,
                           group_gts) -> List[Dict]:
    """Run a same-resolution video group through a BatchedGenerator and
    compute per-video metrics. fps is the GROUP aggregate rate (true
    frames / lockstep wall) assigned to every video — per-video timing is
    meaningless when lanes advance together."""
    t0 = time.time()
    results = batched.run(group_frames, group_templates)
    dt = time.time() - t0
    total = sum(len(f) for f in group_frames)
    fps = total / dt if dt > 0 else 0.0
    return [
        _metrics_from_masks(res["masks"], gts, res["label_scores"],
                            fps=fps, scores=res["scores"])
        for res, gts in zip(results, group_gts)
    ]


def _run_batched_with_gt(batched, dataset, max_videos, gts_of,
                         template_of) -> List[Dict]:
    """Drive a metric-bearing dataset through a BatchedGenerator: videos
    grouped by resolution (one lockstep run per distinct (H, W)), metrics
    per lane, results restored to the ORIGINAL dataset order. `gts_of`
    maps an info dict to the per-frame GT list (None where unannotated);
    `template_of(info, gts)` picks the seeding template."""
    infos = []
    for vi, info in enumerate(dataset.iter_videos()):
        if max_videos is not None and vi >= max_videos:
            break
        infos.append(info)
    groups: Dict[tuple, List[tuple]] = {}
    for pos, info in enumerate(infos):
        first = dataset.load_frame(info["name"], info["frames"][0])
        groups.setdefault(first.shape[:2], []).append((pos, info))
    per_video: List[Optional[Dict]] = [None] * len(infos)
    for group in groups.values():
        frames_list = [dataset.load_frames(i["name"], i["frames"])
                       for _, i in group]
        gts_list = [gts_of(i) for _, i in group]
        templates = [template_of(i, g)
                     for (_, i), g in zip(group, gts_list)]
        vms = _batched_group_metrics(batched, frames_list, templates,
                                     gts_list)
        for (pos, info), vm in zip(group, vms):
            vm["video"] = info["name"]
            per_video[pos] = vm
    return per_video


def _write_video_csvs(run_dir: str, per_video: List[Dict]) -> None:
    whole = pd.DataFrame([
        {k: v for k, v in vm.items()
         if k not in ("per_object", "J_trace", "F_trace", "masks", "scores")}
        for vm in per_video
    ])
    whole.to_csv(os.path.join(run_dir, "whole_metrics.csv"), index=False)
    rows = []
    for vm in per_video:
        for label, ms in vm["per_object"].items():
            rows.append({"video": vm["video"], "object": label, **ms})
    pd.DataFrame(rows).to_csv(
        os.path.join(run_dir, "per_object_metrics.csv"), index=False
    )


def run_model_on_davis_set(
    runname: str,
    model,
    dataset: DavisDataset,
    compute_metrics: bool = True,
    save_masks: bool = False,
    compute_video: bool = False,
    max_videos: Optional[int] = None,
    chunk: Optional[int] = None,
    batched=None,
) -> pd.DataFrame:
    """runner.py:13-124. `chunk`: see _eval_one_video. `batched`: a
    parallel.evaluation.BatchedGenerator — videos then run in lockstep
    batches over the mesh `data` axis, grouped by resolution, with
    identical masks/metrics to the sequential path
    (tests/test_batched_runner.py); fps becomes the group aggregate
    rate."""
    run_dir = _result_dir(runname)
    if batched is not None:
        per_video = _run_batched_with_gt(
            batched, dataset, max_videos,
            gts_of=lambda info: [dataset.load_mask(info["name"], f)
                                 for f in info["frames"]],
            template_of=lambda info, gts: gts[0])
    else:
        per_video = []
        for vi, info in enumerate(dataset.iter_videos()):
            if max_videos is not None and vi >= max_videos:
                break
            video = info["name"]
            frames = dataset.load_frames(video, info["frames"])
            gts = [dataset.load_mask(video, f) for f in info["frames"]]
            vm = _eval_one_video(model, frames, gts[0], gts, chunk=chunk)
            vm["video"] = video
            per_video.append(vm)
    for vm, info in zip(per_video, dataset.iter_videos()):
        video = info["name"]
        if save_masks:
            mask_dir = os.path.join(run_dir, "masks", video)
            os.makedirs(mask_dir, exist_ok=True)
            for f, m in zip(info["frames"], vm["masks"]):
                save_palette_mask(
                    m, os.path.join(mask_dir, f.replace(".jpg", ".png"))
                )
        if compute_video:
            from vosesam_tpu.eval.video_io import write_video
            write_video(
                os.path.join(run_dir, f"{video}.mp4"),
                [p for p in vm["masks"]], fps=10,
            )
        pd.DataFrame({"scores": [s for s in vm["scores"]]}).to_csv(
            os.path.join(run_dir, f"{video}_scores.csv"), index=False
        )

    _write_video_csvs(run_dir, per_video)
    agg = {
        "run": runname,
        "dataset": "DAVIS",
        "JF_mean": float(np.mean([v["JF_mean"] for v in per_video])),
        "J_mean": float(np.mean([v["J_mean"] for v in per_video])),
        "F_mean": float(np.mean([v["F_mean"] for v in per_video])),
        "AP": float(np.mean([v["AP"] for v in per_video])),
        "fps": float(np.mean([v["fps"] for v in per_video])),
    }
    _append_global_ledger(agg)
    return pd.DataFrame(per_video).drop(
        columns=["per_object", "J_trace", "F_trace", "masks", "scores"]
    )


def run_model_on_longdata_set(
    runname: str,
    model,
    dataset: LongVideoDataset,
    save_masks: bool = False,
    max_videos: Optional[int] = None,
    chunk: Optional[int] = None,
    batched=None,
) -> pd.DataFrame:
    """runner.py:127-223 — metrics only at annotated frame ids.
    `chunk`: see _eval_one_video; `batched`: see run_model_on_davis_set."""
    run_dir = _result_dir(runname)

    def _gts_of(info) -> List[Optional[np.ndarray]]:
        gts: List[Optional[np.ndarray]] = [None] * len(info["frames"])
        for i in info["test_ids"]:
            gts[i] = dataset.load_mask(info["name"], info["frames"][i])
        return gts

    if batched is not None:
        per_video = _run_batched_with_gt(
            batched, dataset, max_videos, gts_of=_gts_of,
            template_of=lambda info, gts: gts[info["test_ids"][0]])
        infos = [i for vi, i in enumerate(dataset.iter_videos())
                 if max_videos is None or vi < max_videos]
    else:
        per_video = []
        infos = []
        for vi, info in enumerate(dataset.iter_videos()):
            if max_videos is not None and vi >= max_videos:
                break
            video = info["name"]
            frames = dataset.load_frames(video, info["frames"])
            gts = _gts_of(info)
            template = gts[info["test_ids"][0]]
            vm = _eval_one_video(model, frames, template, gts, chunk=chunk)
            vm["video"] = video
            per_video.append(vm)
            infos.append(info)
    if save_masks:
        for vm, info in zip(per_video, infos):
            mask_dir = os.path.join(run_dir, "masks", info["name"])
            os.makedirs(mask_dir, exist_ok=True)
            for i in info["test_ids"]:
                save_palette_mask(
                    vm["masks"][i],
                    os.path.join(mask_dir, os.path.splitext(info["frames"][i])[0] + ".png"),
                )
    _write_video_csvs(run_dir, per_video)
    agg = {
        "run": runname,
        "dataset": "LongDataset",
        "JF_mean": float(np.mean([v["JF_mean"] for v in per_video])),
        "J_mean": float(np.mean([v["J_mean"] for v in per_video])),
        "F_mean": float(np.mean([v["F_mean"] for v in per_video])),
        "AP": float(np.mean([v["AP"] for v in per_video])),
        "fps": float(np.mean([v["fps"] for v in per_video])),
    }
    _append_global_ledger(agg)
    return pd.DataFrame(per_video).drop(
        columns=["per_object", "J_trace", "F_trace", "masks", "scores"]
    )


def run_model_on_longvos_set(
    runname: str,
    model,
    dataset: LongVideoDataset,
    max_videos: Optional[int] = None,
    batched=None,
    chunk: Optional[int] = None,
) -> None:
    """runner.py:226-284 — no metrics; masks saved for external evaluation.

    `batched`: a parallel.evaluation.BatchedGenerator — the dataset is then
    evaluated in lockstep batches sharded whole-videos-per-device over the
    mesh's `data` axis (BASELINE config 5, 'LVOS batched across a slice').
    `chunk`: sequential path — route propagation through generator_chunked
    (see _eval_one_video). For the batched path, pass `chunk=` to the
    BatchedGenerator constructor instead (DP x chunked — each mesh lane
    runs the one-jit chunked tracker); this function's `chunk` arg is then
    unused.
    Videos are grouped by resolution (one batched run per distinct (H, W));
    uneven lengths inside a group are handled by the generator. Output mask
    PNGs are identical in layout (and, given the same params/config, in
    content — tests/test_batched_runner.py) to the sequential path."""
    run_dir = _result_dir(runname)
    infos = []
    for vi, info in enumerate(dataset.iter_videos()):
        if max_videos is not None and vi >= max_videos:
            break
        infos.append(info)

    def _save(info, masks) -> None:
        mask_dir = os.path.join(run_dir, "masks", info["name"])
        os.makedirs(mask_dir, exist_ok=True)
        for f, m in zip(info["frames"], masks):
            save_palette_mask(
                m, os.path.join(mask_dir, os.path.splitext(f)[0] + ".png")
            )

    if batched is not None:
        groups: Dict[tuple, List[dict]] = {}
        for info in infos:
            first = dataset.load_frame(info["name"], info["frames"][0])
            groups.setdefault(first.shape[:2], []).append(info)
        for hw, group in groups.items():
            frames_list = [
                dataset.load_frames(i["name"], i["frames"]) for i in group
            ]
            templates = [
                dataset.load_mask(i["name"], i["frames"][i["test_ids"][0]])
                for i in group
            ]
            results = batched.run(frames_list, templates)
            for info, res in zip(group, results):
                _save(info, res["masks"])
        return

    for info in infos:
        video = info["name"]
        frames = dataset.load_frames(video, info["frames"])
        template = dataset.load_mask(video, info["frames"][info["test_ids"][0]])
        model.xmem.clear_memory()
        if chunk:
            masks, _scores = model.generator_chunked(frames, template,
                                                     chunk=chunk)
        else:
            masks, *_ = model.generator(frames, template)
        model.xmem.clear_memory()
        _save(info, masks)
