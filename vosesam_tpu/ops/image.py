"""Jitted image pre/post ops.

Replaces the reference's host-side torchvision transforms and padding helpers:
  - ImageNet normalization: tracker/util/range_transform.py:5-10
  - pad_divide_by / unpad: tracker/util/tensor_util.py:17-47
  - SAM mask-prompt resizer: tracker/base_tracker.py:214-229

All functions are shape-polymorphic pure functions safe under ``jax.jit``
(padding amounts are static given static input shapes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def im_normalize(img: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8/float HWC or ...HWC RGB image -> ImageNet-normalized CHW-last.

    Matches ToTensor()+Normalize(mean,std) (track_anything.py:29-32): scales
    to [0,1] then standardizes per channel. Keeps channel-last layout — TPU
    convolutions prefer NHWC.
    """
    x = img.astype(dtype)
    x = x / 255.0 if img.dtype == jnp.uint8 else x
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (x - mean) / std


def im_denormalize(x: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return x * std + mean


def pad_amounts(h: int, w: int, d: int = 16) -> Tuple[int, int, int, int]:
    """Symmetric (left, right, top, bottom) pads to make H,W multiples of d.

    Mirrors tensor_util.py:17-31: ``lh = (new_h - h)//2`` etc., so the extra
    odd pixel lands on the right/bottom.
    """
    new_h = -(-h // d) * d
    new_w = -(-w // d) * d
    lh = (new_h - h) // 2
    uh = new_h - h - lh
    lw = (new_w - w) // 2
    uw = new_w - w - lw
    return lw, uw, lh, uh


def pad_divide_by(x: jax.Array, d: int = 16, axes: Tuple[int, int] = (-3, -2)):
    """Pad spatial axes (default ...HWC layout) to multiples of d.

    Returns (padded, pad_tuple) with pad_tuple=(lw, uw, lh, uh) as in the
    reference so `unpad` can invert it.
    """
    h = x.shape[axes[0]]
    w = x.shape[axes[1]]
    lw, uw, lh, uh = pad_amounts(h, w, d)
    pads = [(0, 0)] * x.ndim
    pads[axes[0] % x.ndim] = (lh, uh)
    pads[axes[1] % x.ndim] = (lw, uw)
    return jnp.pad(x, pads), (lw, uw, lh, uh)


def unpad(x: jax.Array, pad: Tuple[int, int, int, int], axes: Tuple[int, int] = (-3, -2)):
    """Invert pad_divide_by (tensor_util.py:34-47)."""
    lw, uw, lh, uh = pad
    h = x.shape[axes[0]]
    w = x.shape[axes[1]]
    sl = [slice(None)] * x.ndim
    sl[axes[0] % x.ndim] = slice(lh, h - uh if uh > 0 else None)
    sl[axes[1] % x.ndim] = slice(lw, w - uw if uw > 0 else None)
    return x[tuple(sl)]


def resize_bilinear(x: jax.Array, out_hw: Sequence[int], axes: Tuple[int, int] = (-3, -2)) -> jax.Array:
    """Bilinear resize with half-pixel centers.

    jax.image.resize(method='linear') uses half-pixel sampling, which matches
    torch's ``align_corners=False`` interpolate used throughout the reference
    (e.g. tracker/model/modules.py upsample, network.py:118).
    """
    shape = list(x.shape)
    shape[axes[0] % x.ndim] = int(out_hw[0])
    shape[axes[1] % x.ndim] = int(out_hw[1])
    return jax.image.resize(x, shape, method="linear")


def resize_bilinear_align_corners(x: jax.Array, out_hw: Sequence[int]) -> jax.Array:
    """Bilinear resize with ``align_corners=True`` semantics on the last
    (..., H, W, C) spatial axes.

    The E2FGVI flow path downsamples frames to 1/4 with
    ``F.interpolate(..., align_corners=True)`` (inpainter/model/e2fgvi_hq.py
    forward_bidirect_flow) — corner pixels map exactly onto corners, unlike
    jax.image.resize's half-pixel centers."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = int(out_hw[0]), int(out_hw[1])

    # Separable interpolation as two DENSE matmul contractions (MXU work)
    # instead of four gathers (serial scalar work on TPU). Each row of the
    # interp matrix has exactly two nonzeros, and x*0 contributes exactly
    # 0.0 to the sum, so the result matches the gather formulation.
    def axis_matrix(n_in, n_out):
        if n_out == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.linspace(0.0, n_in - 1.0, n_out)
        i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
        i1 = np.minimum(i0 + 1, n_in - 1)
        t = src - i0
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), i0] += (1.0 - t)
        m[np.arange(n_out), i1] += t
        return jnp.asarray(m, x.dtype)

    my = axis_matrix(h, oh)                       # (oh, h)
    mx = axis_matrix(w, ow)                       # (ow, w)
    rows = jnp.einsum("oh,...hwc->...owc", my, x)
    return jnp.einsum("pw,...owc->...opc", mx, rows)


def resize_nearest(x: jax.Array, out_hw: Sequence[int], axes: Tuple[int, int] = (-3, -2)) -> jax.Array:
    shape = list(x.shape)
    shape[axes[0] % x.ndim] = int(out_hw[0])
    shape[axes[1] % x.ndim] = int(out_hw[1])
    return jax.image.resize(x, shape, method="nearest")


def resize_mask_prompt(logit: jax.Array, out_size=256) -> jax.Array:
    """Aspect-preserving resize of an (H, W) logit map into SAM's mask-prompt
    format, bottom/right-padded with the map's minimum.

    Mirrors ``mask_resizer`` (tracker/base_tracker.py:214-229): the long side
    is scaled to the prompt's long side; padding uses min(logit) so padded
    area reads as strongly-negative mask evidence.

    ``out_size`` is an int (square prompt, the official 256) or an
    (out_h, out_w) pair (rectangular-encode mode: the prompt grid is 4x the
    embedding grid, e.g. (144, 256) for a 576x1024 model input).

    Works under jit for static (H, W).
    """
    h, w = logit.shape
    if isinstance(out_size, int):
        out_h = out_w = out_size
    else:
        out_h, out_w = out_size
    scale = min(out_h / h, out_w / w)
    nh = max(1, min(out_h, int(round(h * scale))))
    nw = max(1, min(out_w, int(round(w * scale))))
    resized = jax.image.resize(logit, (nh, nw), method="linear")
    fill = jnp.min(logit)
    out = jnp.full((out_h, out_w), fill, logit.dtype)
    return jax.lax.dynamic_update_slice(out, resized, (0, 0))


def sam_input_resize(
    img: jax.Array, target: int = 1024, rect: bool = False, patch: int = 16,
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Longest-side resize of an (H, W, C) image to SAM's model input with
    bottom/right zero padding (segment_anything ResizeLongestSide semantics).

    rect=False (official): pad to the (target, target) square — for a 480p
    frame ~44% of the encoded tokens are padding. rect=True (TPU fast path,
    SAMConfig.encode_rect): pad each side only up to the next multiple of the
    patch size (e.g. 576x1024 for 480x854), cutting the ViT encode's tokens
    by the padding fraction; coordinates/scales are unchanged since the
    content placement is identical (top-left).

    Returns (padded image, (nh, nw) pre-pad size). Static for static input
    shapes.
    """
    h, w = img.shape[:2]
    scale = target / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = resize_bilinear(img, (nh, nw), axes=(0, 1))
    if rect:
        ph, pw = -(-nh // patch) * patch, -(-nw // patch) * patch
    else:
        ph = pw = target
    out = jnp.zeros((ph, pw) + img.shape[2:], resized.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (0, 0) + (0,) * (img.ndim - 2))
    return out, (nh, nw)


def sam_coords_transform(coords: jax.Array, orig_hw: Tuple[int, int], target: int = 1024) -> jax.Array:
    """Map (..., 2) (x, y) pixel coords from original image space to SAM's
    resized-longest-side space (ResizeLongestSide.apply_coords semantics:
    scale by (target/max_side) with +0.5 half-pixel correction folded into
    the linear scale as torch SAM does)."""
    h, w = orig_hw
    scale = target / max(h, w)
    return coords * scale
