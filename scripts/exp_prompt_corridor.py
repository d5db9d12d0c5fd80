"""Prompt-geometry equivalence corridor vs the reference's host algorithms.

The C/CP/CPS point generators were REDESIGNED for on-device execution
(ops/prompts.py, ops/morphology.py): cv2 contour walking / approxPolyDP
became angular-bin boundary sampling, networkx shortest-path midpoints became
skeleton keypoint selection, DBSCAN became greedy radius dedup. This harness
quantifies the drift of that substitution against the reference's ACTUAL
code (tracker/base_tracker.py:326-362, :383-412, :482-500 — imported from
/root/reference with module shims, not copied):

  1. point-set geometry: symmetric chamfer distance + counts;
  2. downstream SAM masks: reference points -> torch transformers.SamModel
     oracle vs our points -> the JAX predictor with the SAME converted
     weights (the tests/test_reference_parity_sam.py oracle); both
     low-res masks compared by IoU. A torch-vs-torch column isolates the
     geometry-only effect from (already-tested ~0) numerics drift.

skimage is not installed; `skimage.morphology.skeletonize` is shimmed with a
pure-numpy Zhang-Suen thinning (documented stand-in — same family as
skimage's default 2D algorithm and as our on-device thinning).

Run: python scripts/exp_prompt_corridor.py   (CPU; prints a markdown table)
The corridor itself is asserted by tests/test_prompt_corridor.py (slow).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TRACKER = "/root/reference/tracker/base_tracker.py"
HW = 256   # frame/corpus resolution == oracle SAM input size


# ---------------------------------------------------------------- shims

def zhang_suen_skeletonize(mask: np.ndarray) -> np.ndarray:
    """Pure-numpy Zhang-Suen thinning (stand-in for skimage.skeletonize)."""
    img = (np.asarray(mask) > 0).astype(np.uint8)
    img = np.pad(img, 1)

    def neighbors(a):
        p2 = a[:-2, 1:-1]; p3 = a[:-2, 2:]; p4 = a[1:-1, 2:]
        p5 = a[2:, 2:]; p6 = a[2:, 1:-1]; p7 = a[2:, :-2]
        p8 = a[1:-1, :-2]; p9 = a[:-2, :-2]
        return p2, p3, p4, p5, p6, p7, p8, p9

    changed = True
    while changed:
        changed = False
        for phase in (0, 1):
            p2, p3, p4, p5, p6, p7, p8, p9 = neighbors(img)
            c = img[1:-1, 1:-1]
            b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
            seq = [p2, p3, p4, p5, p6, p7, p8, p9, p2]
            a = sum(((seq[i] == 0) & (seq[i + 1] == 1)).astype(np.uint8)
                    for i in range(8))
            if phase == 0:
                cond = ((p2 * p4 * p6) == 0) & ((p4 * p6 * p8) == 0)
            else:
                cond = ((p2 * p4 * p8) == 0) & ((p2 * p6 * p8) == 0)
            kill = (c == 1) & (b >= 2) & (b <= 6) & (a == 1) & cond
            if kill.any():
                img[1:-1, 1:-1][kill] = 0
                changed = True
    return img[1:-1, 1:-1].astype(bool)


def _blank(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def load_reference_prompt_fns():
    """Import the reference BaseTracker module (shimming its unavailable
    deps) and return {'C': fn, 'CP': fn, 'CPS': fn} bound to a __new__
    instance — the reference's real geometry code, zero copying."""
    morphology = _blank("skimage.morphology", skeletonize=zhang_suen_skeletonize)
    tvt = _blank("torchvision.transforms", Compose=object, Resize=object,
                 ToTensor=object)
    shims = {
        "skimage": _blank("skimage", morphology=morphology),
        "skimage.morphology": morphology,
        "progressbar": _blank("progressbar", progressbar=object),
        "torchvision": _blank("torchvision", transforms=tvt),
        "torchvision.transforms": tvt,
        "tracker": _blank("tracker"),
        "tracker.model": _blank("tracker.model"),
        "tracker.model.network": _blank("tracker.model.network", XMem=object),
        "tracker.inference": _blank("tracker.inference"),
        "tracker.inference.inference_core": _blank(
            "tracker.inference.inference_core", InferenceCore=object),
        "tracker.util": _blank("tracker.util"),
        "tracker.util.mask_mapper": _blank(
            "tracker.util.mask_mapper", MaskMapper=object),
        "tracker.util.range_transform": _blank(
            "tracker.util.range_transform", im_normalization=None),
        "tools": _blank("tools"),
        "tools.painter": _blank("tools.painter", mask_painter=None),
        "tools.base_segmenter": _blank(
            "tools.base_segmenter", BaseSegmenter=object),
    }
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_base_tracker", REF_TRACKER)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    bt = mod.BaseTracker.__new__(mod.BaseTracker)

    def _as_xy(arr):
        if arr is None:
            return np.zeros((0, 2), np.int64)
        arr = np.asarray(arr)
        return arr.reshape(-1, 2) if arr.size else np.zeros((0, 2), np.int64)

    return {
        "C": lambda m: _as_xy(bt.get_very_very_best_point_of_interest(m)),
        "CP": lambda m: _as_xy(bt.get_best_points_of_interest_PolyLine(m)),
        "CPS": lambda m: _as_xy(bt.get_skeleton_and_poly(m)),
    }


# ---------------------------------------------------------------- corpus

def corpus(hw: int = HW):
    """Deterministic DAVIS-like binary masks: multi-blob, thin structures,
    holes, concavities, sub-100px2 specks."""
    import cv2

    def canvas():
        return np.zeros((hw, hw), np.uint8)

    out = []

    m = canvas()
    cv2.ellipse(m, (128, 128), (70, 45), 20, 0, 360, 1, -1)
    out.append(("ellipse", m))

    m = canvas()
    box = cv2.boxPoints(((130, 120), (120, 60), 35.0)).astype(np.int32)
    cv2.fillPoly(m, [box], 1)
    out.append(("rot_rect", m))

    m = canvas()
    cv2.circle(m, (80, 90), 40, 1, -1)
    cv2.circle(m, (180, 170), 26, 1, -1)
    out.append(("two_blobs", m))

    m = canvas()
    cv2.circle(m, (120, 120), 45, 1, -1)
    m[30:36, 200:212] = 1          # 72 px2 speck — below the 100 px2 cutoff
    out.append(("speck", m))

    m = canvas()
    m[60:200, 60:68] = 1           # 8-px wide vertical bar
    m[192:200, 60:190] = 1         # horizontal foot -> L
    out.append(("thin_l", m))

    m = canvas()
    cv2.circle(m, (128, 128), 60, 1, -1)
    cv2.circle(m, (128, 128), 28, 0, -1)
    out.append(("donut", m))

    m = canvas()
    cv2.ellipse(m, (128, 128), (60, 60), 0, 40, 320, 1, 24)
    out.append(("c_shape", m))

    m = canvas()
    cv2.circle(m, (120, 128), 55, 1, -1)
    cv2.circle(m, (150, 128), 50, 0, -1)
    out.append(("crescent", m))

    m = canvas()
    cv2.circle(m, (90, 150), 38, 1, -1)
    cv2.line(m, (120, 130), (215, 60), 1, 5)   # thin protrusion
    out.append(("blob_thin", m))

    m = canvas()
    pts = np.array([[128, 40], [150, 105], [215, 105], [163, 145],
                    [183, 210], [128, 168], [73, 210], [93, 145],
                    [41, 105], [106, 105]], np.int32)
    cv2.fillPoly(m, [pts], 1)
    out.append(("star", m))

    m = canvas()
    cv2.circle(m, (70, 70), 28, 1, -1)
    cv2.circle(m, (180, 80), 22, 1, -1)
    cv2.ellipse(m, (128, 190), (48, 22), 0, 0, 360, 1, -1)
    out.append(("multi3", m))

    rng = np.random.default_rng(0)
    m = canvas()
    seeds = rng.integers(70, 190, (14, 2))
    for y, x in seeds:
        m[y, x] = 1
    m = cv2.dilate(m, np.ones((19, 19), np.uint8))
    out.append(("blobby", m))

    return out


def image_for(mask: np.ndarray, seed: int) -> np.ndarray:
    """Synthetic frame: noisy background, tinted object region."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, mask.shape + (3,), np.uint8)
    obj = np.array([210, 60, 60], np.uint8)
    img = np.where(mask[..., None] > 0,
                   (0.25 * img + 0.75 * obj).astype(np.uint8), img)
    return img


# ---------------------------------------------------------------- metrics

def chamfer(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric chamfer (max of the two directed mean NN distances), px."""
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    d = np.linalg.norm(a[:, None, :].astype(np.float64)
                       - b[None, :, :].astype(np.float64), axis=-1)
    return float(max(d.min(1).mean(), d.min(0).mean()))


def iou(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(bool); b = b.astype(bool)
    u = (a | b).sum()
    return float((a & b).sum() / u) if u else 1.0


# ----------------------------------------------------------------- oracle

def build_oracle():
    """Random-weight HF SamModel @ vit_b/256 + the SAME weights converted
    into the JAX predictor (the test_reference_parity_sam.py recipe)."""
    import tempfile

    import torch
    import transformers

    from tests.test_reference_parity_sam import (
        _hf_key_to_official, IMAGE_SIZE, SAM_MEAN, SAM_STD,
    )
    from vosesam_tpu.config import SAMConfig
    from vosesam_tpu.utils.checkpoint import load_sam_checkpoint

    assert IMAGE_SIZE == HW
    torch.manual_seed(0)
    hf_cfg = transformers.SamConfig(
        vision_config=dict(image_size=HW),
        prompt_encoder_config=dict(image_size=HW),
    )
    hf = transformers.SamModel(hf_cfg).eval()
    official = {}
    for k, v in hf.state_dict().items():
        ok = _hf_key_to_official(k)
        if ok:
            official[ok] = v
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "sam_vit_b_hfinit.pth")
        torch.save(official, p)
        cfg = SAMConfig(model_type="vit_b", image_size=HW, hq=False,
                        use_flash_attention=False,
                        windowed_attention_impl="xla")
        params = load_sam_checkpoint(p, cfg)
    return hf, params, cfg, SAM_MEAN, SAM_STD


def torch_mask(hf, img, pts, mean, std):
    """points -> torch SamModel -> binary low-res mask (HW/4, HW/4)."""
    import torch

    pv = torch.from_numpy(
        ((img.astype(np.float32) - mean) / std).transpose(2, 0, 1))[None]
    with torch.no_grad():
        out = hf(pixel_values=pv,
                 input_points=torch.from_numpy(
                     np.asarray(pts, np.float32)[None, None]),
                 input_labels=torch.from_numpy(
                     np.ones((1, 1, len(pts)), np.int64)),
                 multimask_output=False)
    return out.pred_masks[0, 0, 0].numpy() > 0


def jax_mask(params, cfg, img, pts):
    """points -> JAX predictor (same converted weights) -> binary mask."""
    import jax.numpy as jnp

    from vosesam_tpu.models.sam import predictor

    emb = predictor.encode_image(params, jnp.asarray(img), cfg)
    p = np.concatenate([np.asarray(pts, np.float32), [[0.0, 0.0]]], 0)
    l = np.concatenate([np.ones(len(pts), np.int32), [-1]], 0)
    low, _ = predictor.predict_low_res(
        params, emb, jnp.asarray(p), jnp.asarray(l), None, cfg)
    return np.asarray(low[0]) > 0


def our_points(mask: np.ndarray, algo: str) -> np.ndarray:
    """On-device generate_points -> (N, 2) valid xy, numpy."""
    import jax
    import jax.numpy as jnp

    from vosesam_tpu.config import RefinementConfig
    from vosesam_tpu.ops.prompts import generate_points

    cfg = RefinementConfig(point_algorithm=algo)
    ps = jax.jit(generate_points, static_argnums=1)(
        jnp.asarray(mask, jnp.float32), cfg)
    coords = np.asarray(ps.coords)
    valid = np.asarray(ps.valid)
    return coords[valid]


# ------------------------------------------------------------------- main

def run_corridor(algos=("C", "CP", "CPS"), with_oracle=True):
    """Returns rows: per (mask, algo) point counts, chamfer, and (if
    with_oracle) geometry-only IoU (torch-vs-torch) + full-path IoU
    (ref pts->torch vs our pts->JAX)."""
    ref_fns = load_reference_prompt_fns()
    oracle = build_oracle() if with_oracle else None

    rows = []
    for seed, (name, mask) in enumerate(corpus()):
        img = image_for(mask, seed)
        for algo in algos:
            rp = ref_fns[algo](mask.astype(np.uint8))
            op = our_points(mask, algo)
            row = {"mask": name, "algo": algo,
                   "n_ref": len(rp), "n_ours": len(op),
                   "chamfer_px": round(chamfer(rp, op), 2)}
            if oracle is not None and len(rp) and len(op):
                hf, params, cfg, mean, std = oracle
                tm_ref = torch_mask(hf, img, rp, mean, std)
                tm_ours = torch_mask(hf, img, op, mean, std)
                jm_ours = jax_mask(params, cfg, img, op)
                row["iou_geo"] = round(iou(tm_ref, tm_ours), 4)
                row["iou_full"] = round(iou(tm_ref, jm_ours), 4)
                # CONTROL: the same reference points jittered +-2 px (a
                # perturbation no one would call a behavior change) through
                # the same oracle — calibrates the random-weight decoder's
                # intrinsic prompt chaos so iou_geo can be read against it.
                jr = np.random.default_rng(100 + seed)
                rp_jit = rp + jr.integers(-2, 3, rp.shape)
                row["iou_jitter"] = round(
                    iou(tm_ref, torch_mask(hf, img, rp_jit, mean, std)), 4)
            rows.append(row)
    return rows


def main():
    rows = run_corridor()
    cols = ["mask", "algo", "n_ref", "n_ours", "chamfer_px", "iou_geo",
            "iou_full", "iou_jitter"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r.get(c, "—")) for c in cols) + " |")
    for algo in ("C", "CP", "CPS"):
        sub = [r for r in rows if r["algo"] == algo and "iou_geo" in r]
        ch = [r["chamfer_px"] for r in rows
              if r["algo"] == algo and np.isfinite(r["chamfer_px"])]
        if sub:
            print(f"{algo}: median chamfer {np.median(ch):.2f} px, "
                  f"median iou_geo {np.median([r['iou_geo'] for r in sub]):.4f}, "
                  f"min iou_geo {min(r['iou_geo'] for r in sub):.4f}, "
                  f"median iou_full {np.median([r['iou_full'] for r in sub]):.4f}, "
                  f"median iou_jitter {np.median([r['iou_jitter'] for r in sub]):.4f}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
