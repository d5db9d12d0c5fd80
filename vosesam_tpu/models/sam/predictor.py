"""Functional SAM predictor: preprocess -> encode once -> predict per prompt.

Replaces the reference's SamPredictor usage (tools/base_segmenter.py:13-105):
`set_image` becomes `encode_image` returning an embedding that the caller
carries in its state (the embedding cache / `self.embedded` flag becomes a
value, not a flag); `predict` becomes a pure jittable function over fixed-size
prompt packs, vmappable across objects (the reference loops objects through
predict / uses predict_torch for batched boxes, base_tracker.py:698-950).

Static-shape conventions:
  - points arrive as (P, 2) float coords in ORIGINAL image space with labels
    in {-1 pad, 0 neg, 1 pos, 2, 3 box corners};
  - a box is two extra labeled points appended to the pack;
  - mask prompts are (256, 256) logits with a validity flag.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.layers import Params
from vosesam_tpu.models.sam import image_encoder, mask_decoder, prompt_encoder
from vosesam_tpu.ops.image import resize_bilinear, sam_input_resize

SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)


class SamParams(NamedTuple):
    image_encoder: Params
    prompt_encoder: Params
    mask_decoder: Params


@struct.dataclass
class ImageEmbedding:
    embedding: jax.Array              # (64, 64, 256)
    interm: Optional[jax.Array]       # (64, 64, vit_dim) early features (HQ)
    # Shape metadata is static (needed for crops/resizes under jit).
    input_hw: Tuple[int, int] = struct.field(pytree_node=False)  # pre-pad size
    orig_hw: Tuple[int, int] = struct.field(pytree_node=False)   # original size


def sam_init(key, cfg: SAMConfig, dtype=jnp.float32) -> SamParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return SamParams(
        image_encoder=image_encoder.vit_init(k1, cfg, dtype),
        prompt_encoder=prompt_encoder.prompt_encoder_init(k2, cfg, dtype),
        mask_decoder=mask_decoder.mask_decoder_init(k3, cfg, dtype),
    )


def preprocess(img: jax.Array, cfg: SAMConfig) -> Tuple[jax.Array, Tuple[int, int]]:
    """(H, W, 3) uint8/float RGB -> normalized, padded model input.

    Official mode: (S, S, 3) square. encode_rect: each side padded only to
    the next patch multiple (see SAMConfig.encode_rect)."""
    x = img.astype(jnp.float32)
    mean = jnp.asarray(SAM_PIXEL_MEAN, jnp.float32)
    std = jnp.asarray(SAM_PIXEL_STD, jnp.float32)
    if cfg.encode_fixed_hw is not None:
        # aspect-distorting fixed-size encode: the frame fills the whole
        # model input — no padding, every token is content
        fh, fw = cfg.encode_fixed_hw
        resized = resize_bilinear(x, (fh, fw), axes=(0, 1))
        return (resized - mean) / std, (fh, fw)
    if cfg.encode_letterbox_hw is not None:
        # letterbox fast gear: longest-FIT resize (aspect preserved) +
        # bottom/right zero pad to the fixed grid — the official square's
        # exact resize+pad semantics at a custom internal resolution.
        fh, fw = cfg.encode_letterbox_hw
        h0, w0 = x.shape[:2]
        scale = min(fh / h0, fw / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        resized = resize_bilinear(x, (nh, nw), axes=(0, 1))
        norm = (resized - mean) / std
        out = jnp.zeros((fh, fw, x.shape[2]), norm.dtype)
        out = jax.lax.dynamic_update_slice(out, norm, (0, 0, 0))
        return out, (nh, nw)
    resized, input_hw = sam_input_resize(
        x, cfg.image_size, rect=cfg.encode_rect, patch=cfg.patch_size)
    # Normalize, then re-zero the padding (official pads after normalize).
    norm = (resized - mean) / std
    h, w = input_hw
    yy = jnp.arange(resized.shape[0])[:, None]
    xx = jnp.arange(resized.shape[1])[None, :]
    valid = (yy < h) & (xx < w)
    return jnp.where(valid[..., None], norm, 0.0), input_hw


def encode_image(params: SamParams, img: jax.Array, cfg: SAMConfig) -> ImageEmbedding:
    """The per-frame ViT encode — the pipeline's hottest op (§3.2).

    Compute dtype follows the weights (bf16 params -> bf16 activations with
    fp32 softmax, the TPU-native precision recipe)."""
    x, input_hw = preprocess(img, cfg)
    x = x.astype(params.image_encoder["patch_embed"]["proj"]["weight"].dtype)
    if cfg.hq:
        emb, interm = image_encoder.vit_encode(
            params.image_encoder, x, cfg, return_interm=True
        )
        return ImageEmbedding(emb, interm[0], tuple(input_hw), tuple(img.shape[:2]))
    emb = image_encoder.vit_encode(params.image_encoder, x, cfg)
    return ImageEmbedding(emb, None, tuple(input_hw), tuple(img.shape[:2]))


def transform_coords(coords: jax.Array, orig_hw: Tuple[int, int], cfg: SAMConfig) -> jax.Array:
    """Original-image xy -> model-input xy (ResizeLongestSide.apply_coords;
    per-axis stretch under encode_fixed_hw)."""
    h, w = orig_hw
    if cfg.encode_fixed_hw is not None:
        fh, fw = cfg.encode_fixed_hw
        return coords * jnp.asarray([fw / w, fh / h], jnp.float32)
    if cfg.encode_letterbox_hw is not None:
        fh, fw = cfg.encode_letterbox_hw
        return coords * min(fh / h, fw / w)
    scale = cfg.image_size / max(h, w)
    return coords * scale


class SamPrediction(NamedTuple):
    masks: jax.Array        # (n, H, W) boolean at original resolution
    logits_full: jax.Array  # (n, H, W) float logits at original resolution
    iou: jax.Array          # (n,)
    low_res: jax.Array      # (n, 256, 256) logits (reusable as mask prompt)


def predict(
    params: SamParams,
    emb: ImageEmbedding,
    coords: jax.Array,          # (P, 2) original-space xy
    labels: jax.Array,          # (P,) int32
    mask_input: Optional[jax.Array],  # (256, 256) logits or None
    cfg: SAMConfig,
) -> SamPrediction:
    """One prompt-pack -> all mask tokens. Callers pick single/multi/HQ."""
    grid = emb.embedding.shape[:2]
    model_hw = (grid[0] * cfg.patch_size, grid[1] * cfg.patch_size)
    pts = transform_coords(coords, emb.orig_hw, cfg)
    sparse = prompt_encoder.encode_points(
        params.prompt_encoder, pts, labels, cfg, input_hw=model_hw)
    if mask_input is not None:
        dense = prompt_encoder.encode_mask(params.prompt_encoder, mask_input)
    else:
        dense = prompt_encoder.no_mask_dense(params.prompt_encoder, grid)
    pe = prompt_encoder.dense_pe(params.prompt_encoder, grid)
    low_res, iou = mask_decoder.decode_masks(
        params.mask_decoder, emb.embedding, pe, sparse, dense, cfg,
        interm_vit=emb.interm,
    )
    logits_full = postprocess_masks(low_res, emb.input_hw, emb.orig_hw, cfg)
    return SamPrediction(
        masks=logits_full > cfg.mask_threshold,
        logits_full=logits_full,
        iou=iou,
        low_res=low_res,
    )


def postprocess_masks(
    low_res: jax.Array,           # (n, mh, mw) — model_input/4 logits
    input_hw: Tuple[int, int],
    orig_hw: Tuple[int, int],
    cfg: SAMConfig,
) -> jax.Array:
    """Official Sam.postprocess_masks: upsample to the model input size (4x
    the low-res grid — the 1024 square officially, the rect pad under
    encode_rect), crop the un-padded region, resize to the original size."""
    mh, mw = low_res.shape[-2] * 4, low_res.shape[-1] * 4
    up = resize_bilinear(low_res, (mh, mw), axes=(-2, -1))
    up = up[..., : input_hw[0], : input_hw[1]]
    return resize_bilinear(up, orig_hw, axes=(-2, -1))


def predict_low_res(
    params: SamParams,
    emb: ImageEmbedding,
    coords: jax.Array,
    labels: jax.Array,
    mask_input: Optional[jax.Array],
    cfg: SAMConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Decode WITHOUT full-resolution postprocessing: returns
    (low_res (n, S/4, S/4) logits, iou (n,)). Lets callers select the best
    token first and upsample only that one — the refinement loop's hot path
    (one decode per object per frame)."""
    grid = emb.embedding.shape[:2]
    model_hw = (grid[0] * cfg.patch_size, grid[1] * cfg.patch_size)
    pts = transform_coords(coords, emb.orig_hw, cfg)
    sparse = prompt_encoder.encode_points(
        params.prompt_encoder, pts, labels, cfg, input_hw=model_hw)
    if mask_input is not None:
        dense = prompt_encoder.encode_mask(params.prompt_encoder, mask_input)
    else:
        dense = prompt_encoder.no_mask_dense(params.prompt_encoder, grid)
    pe = prompt_encoder.dense_pe(params.prompt_encoder, grid)
    return mask_decoder.decode_masks(
        params.mask_decoder, emb.embedding, pe, sparse, dense, cfg,
        interm_vit=emb.interm,
    )


def select_token(iou: jax.Array, cfg: SAMConfig, multimask: bool) -> jax.Array:
    """Best-token index per the reference predictor's selection."""
    if cfg.hq:
        return jnp.int32(mask_decoder.NUM_MASK_TOKENS)
    if multimask:
        return (jnp.argmax(iou[1:4]) + 1).astype(jnp.int32)
    return jnp.int32(0)


def select_best(pred: SamPrediction, cfg: SAMConfig, multimask: bool):
    """Reference-predictor mask selection: token 0 when single-mask, the
    best-IoU of tokens 1..3 when multimask; SAM-HQ uses the HQ token.

    Returns (mask (H, W) bool, logits (H, W), score (), low_res (256, 256))."""
    if cfg.hq:
        idx = mask_decoder.NUM_MASK_TOKENS  # the HQ token
        # HQ checkpoints predict IoU for the HQ token at the same index.
        return pred.masks[idx], pred.logits_full[idx], pred.iou[idx], pred.low_res[idx]
    if multimask:
        best = jnp.argmax(pred.iou[1:4]) + 1
        return (
            pred.masks[best],
            pred.logits_full[best],
            pred.iou[best],
            pred.low_res[best],
        )
    return pred.masks[0], pred.logits_full[0], pred.iou[0], pred.low_res[0]
