"""On-device SAM prompt generation: the C / CP / CPS point algorithms.

Reference (tracker/base_tracker.py):
  - C   = get_very_very_best_point_of_interest (:326-362) — per connected
    region >=100 px²: moments centroid snapped into the mask + ~5 evenly
    spaced contour points;
  - CP  = get_best_points_of_interest_PolyLine (:383-412) — snapped centroid
    + cv2.approxPolyDP polyline vertices inside the mask;
  - CPS = get_skeleton_and_poly (:482-500) — CP points + skeleton endpoints /
    branchpoints / path midpoints, deduplicated with DBSCAN(eps=5);
  - negative points = other objects' positive points inside this object's
    bbox (find_neg_points :646-656);
  - dispatch at :677-680.

TPU re-design: everything is computed on-device from the (O, H, W) mask
stack with static point budgets and validity flags (SAM's -1 label makes
padded points free). Contour walking/approxPolyDP become angular-bin boundary
sampling; graph shortest-path midpoints become skeleton keypoint + sample
selection (see ops/morphology.py docstring).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import RefinementConfig
from vosesam_tpu.ops import morphology as morph

NUM_BLOBS = 4  # static per-object connected-component budget


class PointSet(NamedTuple):
    coords: jax.Array   # (P, 2) xy fp32, full-resolution frame space
    valid: jax.Array    # (P,) bool


def _per_blob_points(
    blob: jax.Array, blob_valid: jax.Array, n_contour: int, farthest: bool
) -> PointSet:
    """Snapped centroid + angular boundary points for one blob."""
    c, c_ok = morph.mask_centroid(blob)
    c = morph.snap_into_mask(c, blob)
    bpts, bvalid = morph.angular_boundary_points(blob, c, n_contour, farthest)
    coords = jnp.concatenate([c[None], bpts], axis=0)
    valid = jnp.concatenate([(c_ok & blob_valid)[None], bvalid & blob_valid], axis=0)
    return PointSet(coords, valid)


def points_C(mask: jax.Array, cfg: RefinementConfig) -> PointSet:
    """Centroid + evenly spread contour points per blob (C algorithm)."""
    blobs, bvalid = morph.top_blobs(mask, NUM_BLOBS, cfg.min_region_area)
    sets = jax.vmap(
        lambda b, v: _per_blob_points(b, v, cfg.contour_points, farthest=False)
    )(blobs, bvalid)
    return PointSet(
        sets.coords.reshape(-1, 2), sets.valid.reshape(-1)
    )


def points_CP(mask: jax.Array, cfg: RefinementConfig) -> PointSet:
    """Centroid + polyline-vertex-like (farthest-per-angular-bin) points."""
    blobs, bvalid = morph.top_blobs(mask, NUM_BLOBS, cfg.min_region_area)
    sets = jax.vmap(
        lambda b, v: _per_blob_points(b, v, cfg.polyline_points, farthest=True)
    )(blobs, bvalid)
    return PointSet(sets.coords.reshape(-1, 2), sets.valid.reshape(-1))


def points_CPS(mask: jax.Array, cfg: RefinementConfig) -> PointSet:
    """CP points + skeleton endpoints/branchpoints/samples, deduped."""
    cp = points_CP(mask, cfg)
    skel = morph.skeletonize(mask, iterations=48)
    endpoints, branches = morph.skeleton_keypoints(skel)
    # keypoints first (score 3/2), then generic skeleton pixels (score 1)
    score = (
        endpoints.astype(jnp.float32) * 3.0
        + branches.astype(jnp.float32) * 2.0
        + skel.astype(jnp.float32)
    )
    spts, svalid = morph.select_mask_points(score, cfg.skeleton_points)
    coords = jnp.concatenate([cp.coords, spts], axis=0)
    valid = jnp.concatenate([cp.valid, svalid], axis=0)
    valid = morph.dedup_points(coords, valid, cfg.dedup_radius)
    return PointSet(coords, valid)


def generate_points(mask: jax.Array, cfg: RefinementConfig) -> PointSet:
    """Dispatch on cfg.point_algorithm (base_tracker.py:677-680).

    All algorithms pad to their own static size; callers rely on validity."""
    if cfg.point_algorithm == "C":
        return points_C(mask, cfg)
    if cfg.point_algorithm == "CP":
        return points_CP(mask, cfg)
    if cfg.point_algorithm == "CPS":
        return points_CPS(mask, cfg)
    raise ValueError(cfg.point_algorithm)


def point_in_box(pts: jax.Array, box: jax.Array) -> jax.Array:
    """(P, 2) xy inside (4,) xyxy box (inclusive) — point_inside :641."""
    return (
        (pts[:, 0] >= box[0]) & (pts[:, 0] <= box[2])
        & (pts[:, 1] >= box[1]) & (pts[:, 1] <= box[3])
    )


def negative_points(
    all_points: jax.Array,   # (O, P, 2) positive points of every object
    all_valid: jax.Array,    # (O, P)
    boxes: jax.Array,        # (O, 4)
    box_valid: jax.Array,    # (O,)
    max_neg: int,
) -> Tuple[jax.Array, jax.Array]:
    """For each object: other objects' positive points inside its bbox
    (find_neg_points :646-656). Returns ((O, max_neg, 2), (O, max_neg))."""
    o, p, _ = all_points.shape
    flat_pts = all_points.reshape(o * p, 2)
    flat_valid = all_valid.reshape(o * p)
    owner = jnp.repeat(jnp.arange(o), p)

    def per_object(i, box, bok):
        cand = flat_valid & (owner != i) & point_in_box(flat_pts, box) & bok
        # stable top-k selection of candidates by (valid, -index)
        score = cand.astype(jnp.float32) * (2.0 * o * p) - jnp.arange(o * p)
        _, idx = jax.lax.top_k(score, max_neg)
        sel_valid = cand[idx]
        sel = jnp.where(sel_valid[:, None], flat_pts[idx], 0.0)
        return sel, sel_valid

    return jax.vmap(per_object)(jnp.arange(o), boxes, box_valid)


# ------------------------------------------------------------- prompt packs

class PromptPack(NamedTuple):
    """A fixed-size per-object SAM prompt bundle for one refinement mode."""
    coords: jax.Array      # (O, T, 2) frame-space xy
    labels: jax.Array      # (O, T) int32 in {-1, 0, 1, 2, 3}
    use_mask: bool         # static: feed the 256x256 mask prompt?
    has_prompt: jax.Array  # (O,) bool — any live prompt (else keep XMem mask)


def build_prompt_pack(
    mode: str,
    masks: jax.Array,         # (O, H, W) binary per-object XMem masks
    obj_valid: jax.Array,     # (O,) bool
    cfg: RefinementConfig,
) -> PromptPack:
    """Assemble the 10 prompt modes (custom_sam_refinement :698-950) from
    on-device geometry. Point/box budgets are static; empty components are
    label -1 padding."""
    o = masks.shape[0]
    use_pos = mode in ("point", "both", "both_neg", "mask_pos", "mask_bbox_pos", "mask_bbox_pos_neg")
    use_neg = mode in ("both_neg", "mask_bbox_neg", "mask_bbox_pos_neg")
    use_box = mode in ("bbox", "both", "both_neg", "mask_bbox", "mask_bbox_pos", "mask_bbox_neg", "mask_bbox_pos_neg")
    use_mask = mode.startswith("mask")

    boxes, box_ok = jax.vmap(morph.mask_bbox)(masks)
    box_ok = box_ok & obj_valid

    # Positive points are needed for the pos modes AND to derive negatives.
    need_points = use_pos or use_neg
    if need_points:
        psets = jax.vmap(lambda m: generate_points(m, cfg))(masks)
        pos_pts, pos_ok = psets.coords, psets.valid & obj_valid[:, None]
    else:
        pos_pts = jnp.zeros((o, 1, 2))
        pos_ok = jnp.zeros((o, 1), bool)

    parts_c, parts_l, parts_v = [], [], []
    if use_pos:
        parts_c.append(pos_pts)
        parts_l.append(jnp.ones(pos_pts.shape[:2], jnp.int32))
        parts_v.append(pos_ok)
    if use_neg:
        neg_pts, neg_ok = negative_points(
            pos_pts, pos_ok, boxes, box_ok, cfg.max_neg_points
        )
        parts_c.append(neg_pts)
        parts_l.append(jnp.zeros(neg_pts.shape[:2], jnp.int32))
        parts_v.append(neg_ok)
    if use_box:
        corners = jnp.stack([boxes[:, :2], boxes[:, 2:]], axis=1)   # (O, 2, 2)
        clabels = jnp.broadcast_to(jnp.array([2, 3], jnp.int32), (o, 2))
        parts_c.append(corners)
        parts_l.append(clabels)
        parts_v.append(jnp.broadcast_to(box_ok[:, None], (o, 2)))
    if not parts_c:  # pure 'mask' mode still needs a (padded) point array
        parts_c.append(jnp.zeros((o, 1, 2)))
        parts_l.append(jnp.full((o, 1), -1, jnp.int32))
        parts_v.append(jnp.zeros((o, 1), bool))

    coords = jnp.concatenate(parts_c, axis=1)
    labels = jnp.concatenate(parts_l, axis=1)
    valid = jnp.concatenate(parts_v, axis=1)
    labels = jnp.where(valid, labels, -1)
    coords = jnp.where(valid[..., None], coords, 0.0)

    if use_mask:
        # mask prompt alone counts as a live prompt when the mask is nonempty
        has_prompt = obj_valid & (jnp.any(valid, axis=1) | (jnp.sum(masks, (1, 2)) > 0))
    else:
        has_prompt = obj_valid & jnp.any(valid, axis=1)
    return PromptPack(coords, labels, use_mask, has_prompt)
