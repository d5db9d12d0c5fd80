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

# The exact colormap constant the reference paints with (tools/painter.py:
# 10-103 — the public Detectron color table; entry 0 is black/background,
# entry 1 white, objects use entries label+1). Vendoring the constant keeps
# painted outputs pixel-comparable with the reference's.
_COLORMAP_FRACTIONS = (
    (0.000, 0.000, 0.000), (1.000, 1.000, 1.000), (1.000, 0.498, 0.313),
    (0.392, 0.581, 0.929), (0.000, 0.447, 0.741), (0.850, 0.325, 0.098),
    (0.929, 0.694, 0.125), (0.494, 0.184, 0.556), (0.466, 0.674, 0.188),
    (0.301, 0.745, 0.933), (0.635, 0.078, 0.184), (0.300, 0.300, 0.300),
    (0.600, 0.600, 0.600), (1.000, 0.000, 0.000), (1.000, 0.500, 0.000),
    (0.749, 0.749, 0.000), (0.000, 1.000, 0.000), (0.000, 0.000, 1.000),
    (0.667, 0.000, 1.000), (0.333, 0.333, 0.000), (0.333, 0.667, 0.000),
    (0.333, 1.000, 0.000), (0.667, 0.333, 0.000), (0.667, 0.667, 0.000),
    (0.667, 1.000, 0.000), (1.000, 0.333, 0.000), (1.000, 0.667, 0.000),
    (1.000, 1.000, 0.000), (0.000, 0.333, 0.500), (0.000, 0.667, 0.500),
    (0.000, 1.000, 0.500), (0.333, 0.000, 0.500), (0.333, 0.333, 0.500),
    (0.333, 0.667, 0.500), (0.333, 1.000, 0.500), (0.667, 0.000, 0.500),
    (0.667, 0.333, 0.500), (0.667, 0.667, 0.500), (0.667, 1.000, 0.500),
    (1.000, 0.000, 0.500), (1.000, 0.333, 0.500), (1.000, 0.667, 0.500),
    (1.000, 1.000, 0.500), (0.000, 0.333, 1.000), (0.000, 0.667, 1.000),
    (0.000, 1.000, 1.000), (0.333, 0.000, 1.000), (0.333, 0.333, 1.000),
    (0.333, 0.667, 1.000), (0.333, 1.000, 1.000), (0.667, 0.000, 1.000),
    (0.667, 0.333, 1.000), (0.667, 0.667, 1.000), (0.667, 1.000, 1.000),
    (1.000, 0.000, 1.000), (1.000, 0.333, 1.000), (1.000, 0.667, 1.000),
    (0.167, 0.000, 0.000), (0.333, 0.000, 0.000), (0.500, 0.000, 0.000),
    (0.667, 0.000, 0.000), (0.833, 0.000, 0.000), (1.000, 0.000, 0.000),
    (0.000, 0.167, 0.000), (0.000, 0.333, 0.000), (0.000, 0.500, 0.000),
    (0.000, 0.667, 0.000), (0.000, 0.833, 0.000), (0.000, 1.000, 0.000),
    (0.000, 0.000, 0.167), (0.000, 0.000, 0.333), (0.000, 0.000, 0.500),
    (0.000, 0.000, 0.667), (0.000, 0.000, 0.833), (0.000, 0.000, 1.000),
    (0.143, 0.143, 0.143), (0.286, 0.286, 0.286), (0.429, 0.429, 0.429),
    (0.571, 0.571, 0.571), (0.714, 0.714, 0.714), (0.857, 0.857, 0.857),
)

COLORMAP = (np.asarray(_COLORMAP_FRACTIONS, np.float32) * 255).astype(np.uint8)


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
    vectorized: blend all objects at once, then draw contour bands.

    Color convention matches the reference loop: object label o is painted
    with COLORMAP[o + 1] (mask_color=obj+1, base_tracker.py:202) and the
    contour with COLORMAP[1] (mask_painter's default contour_color=1)."""
    img = image.astype(jnp.float32)
    cmap = jnp.asarray(COLORMAP[1: max_objects + 2], jnp.float32)  # label o -> o+1
    is_obj = indexed > 0
    color_map = cmap[jnp.clip(indexed, 0, max_objects)]
    blended = jnp.where(
        is_obj[..., None], img * (1.0 - alpha) + color_map * alpha, img
    )
    out = blended
    contour_color = jnp.asarray(COLORMAP[1], jnp.float32)
    for o in range(1, max_objects + 1):
        m = indexed == o
        band = morph.dilate(m, contour_width) & ~morph.erode(m, contour_width)
        out = jnp.where(band[..., None], contour_color, out)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
