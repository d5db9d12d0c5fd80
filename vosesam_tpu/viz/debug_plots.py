"""Matplotlib debug plotting for the refinement loop.

Reference: tracker/base_tracker.py:536-637 — `print_image_bbox` (frame +
bbox rectangles + pos/neg prompt points), `print_by_objects` (per-object
mask panels with their prompts), `save_masks` (xmem vs refinement masks
side by side). The reference calls these (mostly commented out) while
debugging prompt generation; here they take the framework's static prompt
packs (ops/prompts.py) with validity masks and drop the padded entries.

Host-side, matplotlib-only; never on the compute path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def _fig():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _valid_points(coords: np.ndarray, labels: np.ndarray, want: int) -> np.ndarray:
    """Select rows of a padded (P, 2) pack whose label == want."""
    coords = np.asarray(coords)
    labels = np.asarray(labels)
    return coords[labels == want]


def print_image_bbox(
    image: np.ndarray,
    bounding_boxes: Optional[Sequence[Tuple[float, float, float, float]]],
    pos_points: Optional[Sequence[np.ndarray]] = None,
    neg_points: Optional[Sequence[np.ndarray]] = None,
    save_path: Optional[str] = None,
):
    """base_tracker.py:536-573: frame + red bboxes + red/blue prompt dots."""
    plt = _fig()
    import matplotlib.patches as patches

    fig, ax = plt.subplots()
    ax.imshow(image)
    ax.set_axis_off()
    for bbox in bounding_boxes or []:
        x, y, mx, my = bbox
        ax.add_patch(patches.Rectangle(
            (x, y), mx - x, my - y, linewidth=2, edgecolor="r",
            facecolor="none"))
    for pts in pos_points or []:
        pts = np.asarray(pts)
        if pts.size:
            ax.scatter(pts[:, 0], pts[:, 1], color="red", marker="o", s=20)
    for pts in neg_points or []:
        pts = np.asarray(pts)
        if pts.size:
            ax.scatter(pts[:, 0], pts[:, 1], color="blue", marker="o", s=20)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return fig


def print_by_objects(
    masks: np.ndarray,                 # (O, H, W)
    coords: Optional[np.ndarray] = None,   # (O, P, 2) padded prompt packs
    labels: Optional[np.ndarray] = None,   # (O, P) with {-1 pad, 0 neg, 1 pos}
    obj_valid: Optional[np.ndarray] = None,
    save_path: Optional[str] = None,
):
    """base_tracker.py:575-613: one panel per object with its prompts."""
    plt = _fig()
    masks = np.asarray(masks)
    o = masks.shape[0]
    keep = [i for i in range(o)
            if obj_valid is None or bool(np.asarray(obj_valid)[i])]
    fig, axes = plt.subplots(1, max(len(keep), 1), squeeze=False)
    for col, i in enumerate(keep):
        ax = axes[0][col]
        ax.imshow(masks[i], cmap="gray")
        ax.set_axis_off()
        ax.set_title(f"object {i + 1}", fontsize=8)
        if coords is not None and labels is not None:
            pos = _valid_points(coords[i], labels[i], 1)
            neg = _valid_points(coords[i], labels[i], 0)
            if pos.size:
                ax.scatter(pos[:, 0], pos[:, 1], color="red", s=16)
            if neg.size:
                ax.scatter(neg[:, 0], neg[:, 1], color="blue", s=16)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return fig


def save_masks_side_by_side(
    xmem_mask: np.ndarray,
    refined_mask: np.ndarray,
    save_path: str,
):
    """base_tracker.py:615-637: XMem input vs SAM refinement output."""
    plt = _fig()
    fig, (a, b) = plt.subplots(1, 2)
    a.imshow(xmem_mask)
    a.set_title("xmem", fontsize=8)
    a.set_axis_off()
    b.imshow(refined_mask)
    b.set_title("refined", fontsize=8)
    b.set_axis_off()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
