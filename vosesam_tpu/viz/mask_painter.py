"""Fancy mask painter: background dim + soft contour, four blur modes.

Reference: tools/mask_painter.py:105-222 — a signed distance map
(cv2.distanceTransform fore − back) drives (a) a background alpha ramp and
(b) a contour band whose softness depends on the mode:

  '00'  hard background mask, hard contour
  '01'  hard background mask, soft contour
  '10'  soft background ramp, hard contour
  '11'  soft background ramp, soft contour   (reference default)

Used for first-frame interactive painting (tools/interact_tools.py:10).

TPU re-design: the distance transform is only ever CLIPPED to a few pixels
(background_blur_radius/contour_width defaults 7/3), so the exact clipped
signed L2 distance is computable as a min over a static (2r+1)² shift window
— jittable, no host round trip (the reference runs cv2 on the host per
frame). Images larger than 1024 px are downsampled first exactly like the
reference (:205-210)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.ops.image import resize_bilinear
from vosesam_tpu.viz.painter import COLORMAP


def clipped_signed_distance(mask: jax.Array, clip: float) -> jax.Array:
    """Signed L2 distance (fore positive, back negative), exact within
    ±clip. mask: (H, W) {0,1}."""
    m = mask > 0.5
    r = int(clip) + 1
    inf = jnp.float32(1e9)
    d_fore = jnp.full(mask.shape, inf)   # distance to nearest background px
    d_back = jnp.full(mask.shape, inf)   # distance to nearest foreground px
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            dist = (dy * dy + dx * dx) ** 0.5
            if dist > r:
                continue
            sh = jnp.roll(m, (dy, dx), axis=(0, 1))
            # out-of-image reads: treat as background (cv2 semantics: the
            # transform only measures within the image; borders act as
            # background for d_fore via the implicit zero border)
            yy = jnp.arange(mask.shape[0])[:, None]
            xx = jnp.arange(mask.shape[1])[None, :]
            inb = (
                (yy - dy >= 0) & (yy - dy < mask.shape[0])
                & (xx - dx >= 0) & (xx - dx < mask.shape[1])
            )
            sh_is_back = (~sh) & inb
            sh_is_fore = sh & inb
            d_fore = jnp.where(sh_is_back, jnp.minimum(d_fore, dist), d_fore)
            d_back = jnp.where(sh_is_fore, jnp.minimum(d_back, dist), d_back)
    d_fore = jnp.where(m, jnp.minimum(d_fore, clip), 0.0)
    d_back = jnp.where(~m, jnp.minimum(d_back, clip), 0.0)
    return d_fore - d_back


def _background_ramp(dist_map: jax.Array, radius: float) -> jax.Array:
    b = jnp.clip(dist_map, -radius, radius)
    b = b - jnp.min(b)
    return b / jnp.maximum(jnp.max(b), 1e-6)


def _contour_band(dist_map: jax.Array, radius: float, hard: bool) -> jax.Array:
    r = radius + 2
    c = jnp.abs(jnp.clip(dist_map, -r, r))
    c = c / jnp.maximum(jnp.max(c), 1e-6)
    if hard:
        c = jnp.where(c > 0.5, 1.0, c)
    return c


def vis_add_mask(
    image: jax.Array,            # (H, W, 3) float/uint8
    background_mask: jax.Array,  # (H, W) in [0, 1] — 1 keeps the pixel
    contour_mask: jax.Array,     # (H, W) in [0, 1] — 0 paints the contour
    background_color,
    contour_color,
    background_alpha: float,
    contour_alpha: float,
) -> jax.Array:
    """tools/mask_painter.py:105-120 blend."""
    img = image.astype(jnp.float32)
    bc = jnp.asarray(background_color, jnp.float32)
    cc = jnp.asarray(contour_color, jnp.float32)
    bw = (1 - background_alpha + background_mask * background_alpha)[..., None]
    img = img * bw + bc * (1 - bw)
    cw = (1 - contour_alpha + contour_mask * contour_alpha)[..., None]
    img = img * cw + cc * (1 - cw)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def fancy_mask_painter(
    image: jax.Array,      # (H, W, 3) uint8
    mask: jax.Array,       # (H, W) {0,1}
    background_alpha: float = 0.5,
    background_blur_radius: int = 7,
    contour_width: int = 3,
    contour_color: int = 3,
    contour_alpha: float = 1.0,
    mode: str = "11",
) -> jax.Array:
    """tools/mask_painter.py:183-222. Returns a (possibly downsampled to
    <=1024 px) painted uint8 image."""
    if background_blur_radius % 2 == 0 or contour_width % 2 == 0:
        raise ValueError("background_blur_radius and contour_width must be odd")
    if mode not in ("00", "01", "10", "11"):
        raise ValueError(f"mode must be one of 00/01/10/11, got {mode!r}")

    h, w = image.shape[:2]
    ratio = min(1024.0 / max(h, w), 1.0)
    if ratio < 1.0:
        nh, nw = int(h * ratio), int(w * ratio)
        image = resize_bilinear(image.astype(jnp.float32), (nh, nw))
        mask = resize_bilinear(mask.astype(jnp.float32), (nh, nw),
                               axes=(-2, -1))
    msk = jnp.clip(mask, 0, 1)

    bg_radius = (background_blur_radius - 1) // 2
    ct_radius = (contour_width - 1) // 2
    dist_map = clipped_signed_distance(msk, max(bg_radius, ct_radius + 2))

    soft_bg = mode[0] == "1"
    soft_ct = mode[1] == "1"
    background = (
        _background_ramp(dist_map, bg_radius) if soft_bg else msk
    )
    contour = _contour_band(dist_map, ct_radius, hard=not soft_ct)

    return vis_add_mask(
        image, background, contour,
        COLORMAP[0], COLORMAP[contour_color],
        background_alpha, contour_alpha,
    )
