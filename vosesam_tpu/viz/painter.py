"""Mask / point visualization, on-device.

Reference: tools/painter.py (80-entry colormap :10-103, alpha-blend +
distance-transform contour band mask_painter :137-157, dilated point dots
point_painter :112-135, RGBA cutout background_remover :159-172) and
tools/mask_painter.py (blur/dim variants). The reference paints per object
per frame on the host with cv2 — a per-frame host round trip. Here painting
is a jittable function of the indexed mask; the contour band comes from
morphological dilate/erode instead of a distance transform (same band, no
scatter)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.ops import morphology as morph

# A 80-entry categorical colormap (RGB uint8) — same role as
# tools/painter.py:10-103 (values regenerated, not copied).
def _build_colormap(n: int = 80) -> np.ndarray:
    rng = np.random.default_rng(2024)
    base = np.array(
        [
            [255, 99, 71], [60, 179, 113], [65, 105, 225], [255, 215, 0],
            [186, 85, 211], [0, 206, 209], [255, 140, 0], [220, 20, 60],
            [154, 205, 50], [30, 144, 255], [255, 105, 180], [0, 250, 154],
        ],
        np.uint8,
    )
    extra = rng.integers(40, 255, (max(0, n - len(base)), 3), dtype=np.uint8)
    return np.concatenate([base, extra], 0)[:n]


COLORMAP = _build_colormap()


def mask_painter(
    image: jax.Array,       # (H, W, 3) uint8
    mask: jax.Array,        # (H, W) bool/float
    color: jax.Array,       # (3,) uint8/float RGB
    alpha: float = 0.7,
    contour_width: int = 2,
) -> jax.Array:
    """Alpha-blend a colored mask + solid contour band (painter.py:137-157)."""
    img = image.astype(jnp.float32)
    m = mask.astype(bool)
    c = color.astype(jnp.float32)
    blended = jnp.where(
        m[..., None], img * (1.0 - alpha) + c * alpha, img
    )
    band = morph.dilate(m, contour_width) & ~morph.erode(m, contour_width)
    out = jnp.where(band[..., None], c, blended)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def point_painter(
    image: jax.Array,      # (H, W, 3) uint8
    points: jax.Array,     # (P, 2) xy
    valid: jax.Array,      # (P,) bool
    color: jax.Array,      # (3,)
    radius: int = 5,
) -> jax.Array:
    """Paint dots at points (painter.py:112-135) via a distance test."""
    h, w = image.shape[:2]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    d2 = (xx - points[:, 0]) ** 2 + (yy - points[:, 1]) ** 2   # (H, W, P)
    hit = jnp.any((d2 <= radius * radius) & valid[None, None, :], axis=-1)
    return jnp.where(
        hit[..., None], color.astype(jnp.uint8), image
    )


def background_remover(image: jax.Array, mask: jax.Array) -> jax.Array:
    """(H, W, 4) RGBA cutout (painter.py:159-172)."""
    a = (mask.astype(jnp.uint8) * 255)[..., None]
    return jnp.concatenate([image.astype(jnp.uint8), a], axis=-1)


def paint_indexed(
    image: jax.Array,       # (H, W, 3) uint8
    indexed: jax.Array,     # (H, W) int32, 0 = background
    max_objects: int,
    alpha: float = 0.7,
    contour_width: int = 2,
) -> jax.Array:
    """Paint every object of an indexed mask (base_tracker.py:197-202 loop),
    vectorized: blend all objects at once, then draw contour bands."""
    img = image.astype(jnp.float32)
    cmap = jnp.asarray(COLORMAP[: max_objects + 1], jnp.float32)  # 1-based
    is_obj = indexed > 0
    color_map = cmap[jnp.clip(indexed, 0, max_objects)]
    blended = jnp.where(
        is_obj[..., None], img * (1.0 - alpha) + color_map * alpha, img
    )
    out = blended
    for o in range(1, max_objects + 1):
        m = indexed == o
        band = morph.dilate(m, contour_width) & ~morph.erode(m, contour_width)
        out = jnp.where(band[..., None], cmap[o], out)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
