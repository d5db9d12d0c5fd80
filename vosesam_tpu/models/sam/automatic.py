"""Automatic mask generation (SamAutomaticMaskGenerator capability).

The reference exposes this via the `metaseg` demo (demo.py:1-87 — SAM
automask / SAHI demos). Rebuilt natively: a regular point grid is prompted in
batches (vmap), masks are filtered by predicted IoU + stability score and
deduplicated with mask-IoU NMS. Everything up to the NMS runs on-device."""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.sam import predictor


class AutoMasks(NamedTuple):
    masks: np.ndarray       # (N, H, W) bool
    scores: np.ndarray      # (N,)
    points: np.ndarray      # (N, 2) the generating point


def _stability_score(logits: jax.Array, threshold: float, offset: float) -> jax.Array:
    """IoU between thresholdings at (t+o) and (t-o) (official stability)."""
    hi = jnp.sum(logits > threshold + offset, axis=(-2, -1))
    lo = jnp.sum(logits > threshold - offset, axis=(-2, -1))
    return hi / jnp.maximum(lo, 1)


def generate_masks(
    sam_params: predictor.SamParams,
    image: np.ndarray,
    cfg: SAMConfig,
    points_per_side: int = 16,
    pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.90,
    nms_iou: float = 0.7,
    batch: int = 16,
) -> AutoMasks:
    h, w = image.shape[:2]
    emb = predictor.encode_image(sam_params, jnp.asarray(image), cfg)

    xs = (np.arange(points_per_side) + 0.5) / points_per_side * w
    ys = (np.arange(points_per_side) + 0.5) / points_per_side * h
    grid = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)

    @jax.jit
    def predict_batch(pts):
        def one(pt):
            coords = pt[None]
            labels = jnp.ones((1,), jnp.int32)
            pred = predictor.predict(sam_params, emb, coords, labels, None, cfg)
            best = jnp.argmax(pred.iou[1:4]) + 1
            stab = _stability_score(
                pred.logits_full[best], cfg.mask_threshold, 1.0
            )
            return pred.masks[best], pred.iou[best], stab

        return jax.vmap(one)(pts)

    all_masks, all_iou, all_stab = [], [], []
    for i in range(0, len(grid), batch):
        chunk = grid[i: i + batch]
        if len(chunk) < batch:
            chunk = np.pad(chunk, ((0, batch - len(chunk)), (0, 0)))
        m, iou, stab = predict_batch(jnp.asarray(chunk, jnp.float32))
        all_masks.append(np.asarray(m)[: len(grid) - i])
        all_iou.append(np.asarray(iou)[: len(grid) - i])
        all_stab.append(np.asarray(stab)[: len(grid) - i])

    masks = np.concatenate(all_masks)
    ious = np.concatenate(all_iou)
    stabs = np.concatenate(all_stab)

    keep = (ious >= pred_iou_thresh) & (stabs >= stability_thresh) & (
        masks.sum((1, 2)) > 0
    )
    masks, ious, pts = masks[keep], ious[keep], grid[keep]

    # greedy mask-IoU NMS, highest predicted IoU first
    order = np.argsort(-ious)
    kept: List[int] = []
    flat = masks.reshape(len(masks), -1)
    areas = flat.sum(-1)
    for idx in order:
        ok = True
        for j in kept:
            inter = np.logical_and(flat[idx], flat[j]).sum()
            union = areas[idx] + areas[j] - inter
            if union > 0 and inter / union > nms_iou:
                ok = False
                break
        if ok:
            kept.append(idx)
    return AutoMasks(masks[kept], ious[kept], pts[kept])
