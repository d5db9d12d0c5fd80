"""On-device binary-mask morphology for prompt generation.

Replaces the reference's host-side OpenCV/skimage/networkx stack
(tracker/base_tracker.py:231-500: cv2.findContours/moments/approxPolyDP,
skimage.skeletonize, networkx shortest paths, sklearn DBSCAN) with
TPU-expressible primitives: shifted-mask neighborhoods, iterative
max-propagation blob labeling, Zhang-Suen thinning, and masked reductions —
all static shapes, all jittable.

Design notes (re-design, not translation — see SURVEY.md §7 step 5):
  - connected components via fixed-iteration 8-neighbor max-label
    propagation at a downsampled grid (dilated jumps would leak across
    gaps between blobs, so propagation is strictly 3x3);
  - the top-B largest blobs are extracted with a scatter-add area histogram
    (labels are pixel indices, so the histogram lives in an HW-sized array);
  - contour points come from angular-bin boundary sampling around the blob
    centroid (the reference strides along the cv2 contour polyline; evenly
    spaced angles give the same coverage without an ordered contour walk);
  - skeletons via Zhang-Suen two-subiteration thinning (the reference's
    endpoint/branch detection is already a 3x3 neighbor-count conv,
    base_tracker.py:414-420 — kept identical).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-padded shift of a 2-D map."""
    h, w = x.shape
    padded = jnp.pad(x, ((1, 1), (1, 1)))
    return jax.lax.dynamic_slice(padded, (1 - dy, 1 - dx), (h, w))


def neighbors8(x: jax.Array):
    """The 8 neighbors in Zhang-Suen order P2..P9 (N, NE, E, SE, S, SW, W, NW).

    One shared pad + 8 slices (not 8 pad+slice pairs)."""
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)))

    def s(dy, dx):
        return jax.lax.dynamic_slice(p, (1 - dy, 1 - dx), (h, w))

    return [s(-1, 0), s(-1, 1), s(0, 1), s(1, 1),
            s(1, 0), s(1, -1), s(0, -1), s(-1, -1)]


def _window3_sum(x: jax.Array) -> jax.Array:
    """3x3 window sum (SAME padding) as ONE reduce_window — much cheaper on
    TPU than 8 pad+slice shifts."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (3, 3), (1, 1), "SAME")


def _window3_max(x: jax.Array) -> jax.Array:
    init = (jnp.iinfo(x.dtype).min
            if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (3, 3), (1, 1), "SAME")


def neighbor_count(mask: jax.Array) -> jax.Array:
    """3x3 neighbor count (excluding center) — base_tracker.py:414-420."""
    m = mask.astype(jnp.float32)
    return _window3_sum(m) - m


def dilate(mask: jax.Array, iterations: int = 1) -> jax.Array:
    m = mask.astype(bool)
    for _ in range(iterations):
        m = m | (neighbor_count(m) > 0)
    return m


def erode(mask: jax.Array, iterations: int = 1) -> jax.Array:
    m = mask.astype(bool)
    for _ in range(iterations):
        m = m & (neighbor_count(m) >= 8)
    return m


def boundary(mask: jax.Array) -> jax.Array:
    """1-px inner boundary: mask minus its erosion."""
    m = mask.astype(bool)
    return m & ~erode(m, 1)


# ------------------------------------------------------------ blob labeling

def label_blobs(mask: jax.Array, iterations: int = 128) -> jax.Array:
    """Connected components by 8-neighbor max-label propagation.

    Returns an int32 map where every pixel of a blob carries the blob's
    maximum linear pixel index (0 outside the mask; indices are 1-based to
    reserve 0 for background). `iterations` bounds the blob diameter that
    converges; run on a downsampled grid for large masks."""
    h, w = mask.shape
    m = mask.astype(bool)
    # float32 labels: pixel indices (< 2^24 up to 4k-resolution masks) are
    # exact in f32, and f32 3x3 max-pool is the well-supported TPU path
    # (int32 reduce_window max hung the remote compiler)
    idx = (jnp.arange(h * w, dtype=jnp.float32) + 1.0).reshape(h, w)
    labels = jnp.where(m, idx, 0.0)

    def body(_, lab):
        # ONE 3x3 reduce_window max == max(lab, all 8 neighbors) since the
        # window includes the center — replaces 8 pad+slice shifts
        return jnp.where(m, _window3_max(lab), 0.0)

    labels = jax.lax.fori_loop(0, iterations, body, labels)
    return labels.astype(jnp.int32)


def top_blobs(
    mask: jax.Array,
    num_blobs: int,
    min_area: float,
    label_iterations: int = 128,
    downsample: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Extract the `num_blobs` largest connected components.

    Labeling runs at mask/`downsample` resolution (max-pooled so thin
    structures survive); blob masks are returned at full resolution.
    Returns (blobs (B, H, W) bool, valid (B,) bool with area >= min_area)."""
    h, w = mask.shape
    m = mask.astype(bool)
    if downsample > 1:
        hd, wd = h // downsample, w // downsample
        small = jax.lax.reduce_window(
            m[: hd * downsample, : wd * downsample].astype(jnp.int32),
            0, jax.lax.max,
            (downsample, downsample), (downsample, downsample), "VALID",
        ).astype(bool)
    else:
        small = m
    labels = label_blobs(small, label_iterations)          # (hd, wd)
    flat = labels.reshape(-1)
    hw = flat.shape[0]
    # area histogram over label values (labels are 1..hw; bucket 0 = bg)
    areas = jnp.zeros(hw + 1, jnp.float32).at[flat].add(flat > 0)
    areas = areas.at[0].set(0.0)
    top_area, top_label = jax.lax.top_k(areas, num_blobs)

    lab_up = jax.image.resize(
        labels, (h, w), method="nearest"
    ) if downsample > 1 else labels
    blobs = (lab_up[None] == top_label[:, None, None]) & (top_label[:, None, None] > 0) & m[None]
    # area check at FULL resolution to mirror the >=100 px² contour cut
    full_area = jnp.sum(blobs, axis=(1, 2)).astype(jnp.float32)
    valid = (top_label > 0) & (full_area >= min_area)
    return blobs, valid


# --------------------------------------------------------- mask measurements

def mask_centroid(mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Moments centroid -> ((x, y) fp32, valid). base_tracker.py:336-340."""
    m = mask.astype(jnp.float32)
    total = jnp.sum(m)
    ys = jnp.sum(m * jnp.arange(mask.shape[0], dtype=jnp.float32)[:, None])
    xs = jnp.sum(m * jnp.arange(mask.shape[1], dtype=jnp.float32)[None, :])
    denom = jnp.maximum(total, 1.0)
    return jnp.stack([xs / denom, ys / denom]), total > 0


def snap_into_mask(point_xy: jax.Array, mask: jax.Array) -> jax.Array:
    """Nearest mask pixel to (x, y) — the reference walks the centroid into
    the mask when it lands outside (base_tracker.py:341-349)."""
    h, w = mask.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    d2 = (xx - point_xy[0]) ** 2 + (yy - point_xy[1]) ** 2
    d2 = jnp.where(mask.astype(bool), d2, jnp.inf)
    flat = jnp.argmin(d2)
    y, x = flat // w, flat % w
    return jnp.stack([x, y]).astype(jnp.float32)


def mask_bbox(mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Tight bbox -> ((x0, y0, x1, y1) fp32 inclusive, valid).
    base_tracker.py:231-243."""
    m = mask.astype(bool)
    any_row = jnp.any(m, axis=1)
    any_col = jnp.any(m, axis=0)
    h, w = mask.shape
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    y0 = jnp.min(jnp.where(any_row, ys, h))
    y1 = jnp.max(jnp.where(any_row, ys, -1))
    x0 = jnp.min(jnp.where(any_col, xs, w))
    x1 = jnp.max(jnp.where(any_col, xs, -1))
    valid = jnp.any(m)
    box = jnp.stack([x0, y0, x1, y1]).astype(jnp.float32)
    return jnp.where(valid, box, 0.0), valid


def amplify_bbox(box: jax.Array, pixels: float, hw: Tuple[int, int]) -> jax.Array:
    """Grow a bbox by `pixels` on each side, clamped (base_tracker.py:658-675)."""
    h, w = hw
    return jnp.stack([
        jnp.clip(box[0] - pixels, 0, w - 1),
        jnp.clip(box[1] - pixels, 0, h - 1),
        jnp.clip(box[2] + pixels, 0, w - 1),
        jnp.clip(box[3] + pixels, 0, h - 1),
    ])


# ------------------------------------------------------- boundary sampling

def angular_boundary_points(
    mask: jax.Array,
    center_xy: jax.Array,
    num_points: int,
    farthest: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Sample boundary pixels at `num_points` evenly spaced angles around
    `center_xy`.

    TPU-friendly stand-in for the reference's stride-along-contour sampling
    (C algorithm, base_tracker.py:353-360) and approxPolyDP vertices (CP,
    :383-412): nearest-to-bin-center angle (even coverage) or, with
    `farthest`, the largest-radius boundary pixel per bin (corner-like).
    Returns ((P, 2) xy fp32, (P,) valid)."""
    h, w = mask.shape
    b = boundary(mask)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    dx = xx - center_xy[0]
    dy = yy - center_xy[1]
    ang = jnp.arctan2(dy, dx)                      # (-pi, pi]
    r2 = dx * dx + dy * dy
    bins = (jnp.arange(num_points, dtype=jnp.float32) + 0.5) / num_points
    bin_centers = bins * 2.0 * jnp.pi - jnp.pi     # (P,)

    diff = jnp.abs(ang[None] - bin_centers[:, None, None])
    diff = jnp.minimum(diff, 2.0 * jnp.pi - diff)  # circular distance
    in_bin = diff <= (jnp.pi / num_points)

    bmask = b[None] & in_bin                       # (P, H, W)
    score = jnp.where(bmask, r2[None] if farthest else -diff, -jnp.inf)
    flat = score.reshape(num_points, -1)
    idx = jnp.argmax(flat, axis=-1)
    py, px = idx // w, idx % w
    valid = jnp.any(bmask.reshape(num_points, -1), axis=-1)
    pts = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    return jnp.where(valid[:, None], pts, 0.0), valid


# ------------------------------------------------------------------ skeleton

def _zhang_suen_transitions(ns):
    """A(P1): 0->1 transitions in the circular sequence P2..P9."""
    seq = ns + [ns[0]]
    return sum(
        jnp.logical_and(~seq[i].astype(bool), seq[i + 1].astype(bool)).astype(jnp.float32)
        for i in range(8)
    )


def skeletonize(mask: jax.Array, iterations: int = 64) -> jax.Array:
    """Zhang-Suen thinning (fixed iteration budget).

    Replaces skimage.morphology.skeletonize (base_tracker.py:457-459)."""
    m = mask.astype(bool)

    def subiter(m, first: bool):
        ns = neighbors8(m.astype(jnp.float32))
        bcount = sum(ns)
        a = _zhang_suen_transitions([n.astype(bool) for n in ns])
        p2, p4, p6, p8 = ns[0].astype(bool), ns[2].astype(bool), ns[4].astype(bool), ns[6].astype(bool)
        if first:
            c1 = ~(p2 & p4 & p6)
            c2 = ~(p4 & p6 & p8)
        else:
            c1 = ~(p2 & p4 & p8)
            c2 = ~(p2 & p6 & p8)
        remove = (
            m & (bcount >= 2) & (bcount <= 6) & (a == 1) & c1 & c2
        )
        return m & ~remove

    def body(_, m):
        m = subiter(m, True)
        m = subiter(m, False)
        return m

    return jax.lax.fori_loop(0, iterations, body, m)


def skeleton_keypoints(skel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(endpoints, branchpoints) boolean maps via neighbor counts
    (base_tracker.py:414-420)."""
    s = skel.astype(bool)
    n = neighbor_count(s)
    endpoints = s & (n == 1)
    branches = s & (n >= 3)
    return endpoints, branches


def select_mask_points(
    score_mask: jax.Array, num_points: int
) -> Tuple[jax.Array, jax.Array]:
    """Pick up to `num_points` pixels with the highest score (use a boolean
    map for arbitrary picks). Returns ((P, 2) xy, (P,) valid)."""
    h, w = score_mask.shape
    flat = score_mask.astype(jnp.float32).reshape(-1)
    vals, idx = jax.lax.top_k(flat, num_points)
    py, px = idx // w, idx % w
    valid = vals > 0
    pts = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    return jnp.where(valid[:, None], pts, 0.0), valid


def dedup_points(
    pts: jax.Array, valid: jax.Array, radius: float
) -> jax.Array:
    """Greedy radius dedup of a small point set — DBSCAN(eps) stand-in
    (base_tracker.py:469-480). Returns the updated validity mask.

    Sequential over the (static, small) point budget: point i survives if no
    surviving earlier point lies within `radius`."""
    n = pts.shape[0]
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, -1)
    r2 = radius * radius

    def body(i, keep):
        earlier = (jnp.arange(n) < i) & keep & valid
        close = (d2[i] <= r2) & earlier
        ok = keep[i] & ~jnp.any(close)
        return keep.at[i].set(ok)

    return jax.lax.fori_loop(0, n, body, valid)
