"""Vanishing-mask SAM refinement: the paper's core contribution, on-device.

Reference: tracker/base_tracker.py custom_sam_refinement (:683-976) —
per-frame, each XMem object mask is refined by prompting SAM with
auto-generated geometry (10 modes × 3 point algorithms), an optional
IoU-score gate reverts low-confidence SAM masks to the XMem mask (:954-958),
and the per-object results are composited lowest-score-first so
higher-confidence masks overwrite (:960-964).

TPU re-design: one jitted function. The SAM image embedding is computed once
(the reference's set_image, its hottest op); prompt packs are built on-device
(ops/prompts.py); the per-object predicts are a vmap over a static object
axis; the score-sorted painting loop becomes a per-pixel argmax over
score-ranked claims (identical winner: ascending paint order == highest score
wins on overlap). The empty-prompt fallback keeps the XMem mask + score
(:736-739)."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.models.sam import predictor
from vosesam_tpu.ops import prompts as prompt_ops
from vosesam_tpu.ops.image import resize_mask_prompt


class RefinementResult(NamedTuple):
    masks: jax.Array        # (O, H, W) bool — final per-object masks
    scores: jax.Array       # (O,) — SAM IoU or XMem score per object
    indexed: jax.Array      # (H, W) int32 — composited label map (0 = bg)
    used_sam: jax.Array     # (O,) bool — SAM output kept (vs XMem fallback)


def refine_masks(
    sam_params: predictor.SamParams,
    emb: predictor.ImageEmbedding,
    xmem_masks: jax.Array,    # (O, H, W) binary XMem per-object masks
    xmem_logits: jax.Array,   # (O, H, W) XMem aggregated logits (no bg)
    xmem_scores: jax.Array,   # (O,) XMem per-object confidence (max prob)
    obj_valid: jax.Array,     # (O,) bool
    cfg: FrameworkConfig,
) -> RefinementResult:
    rcfg = cfg.refinement
    scfg = cfg.sam

    pack = prompt_ops.build_prompt_pack(rcfg.mode, xmem_masks, obj_valid, rcfg)

    if pack.use_mask:
        # SAM's mask prompt is 4x the embedding grid (256x256 for the 1024
        # square input; e.g. 144x256 under encode_rect). Under
        # encode_fixed_hw the frame fills the grid, so the logit map is
        # STRETCHED over the whole prompt instead of aspect-fit + fill.
        prompt_hw = (emb.embedding.shape[0] * 4, emb.embedding.shape[1] * 4)
        if scfg.encode_fixed_hw is not None:
            mask_prompts = jax.vmap(
                lambda lg: jax.image.resize(lg, prompt_hw, "linear")
            )(xmem_logits)
        else:
            mask_prompts = jax.vmap(
                lambda lg: resize_mask_prompt(lg, prompt_hw)
            )(xmem_logits)
    else:
        mask_prompts = None

    def predict_one(coords, labels, mask_prompt):
        # select the best token BEFORE full-res upsampling: one (256,256) ->
        # (H, W) resize per object instead of one per mask token
        low_res, iou = predictor.predict_low_res(
            sam_params, emb, coords, labels,
            mask_prompt if pack.use_mask else None, scfg,
        )
        tok = predictor.select_token(iou, scfg, scfg.multimask_output)
        best = jnp.take(low_res, tok, axis=0)
        logits_full = predictor.postprocess_masks(
            best[None], emb.input_hw, emb.orig_hw, scfg
        )[0]
        return logits_full > scfg.mask_threshold, jnp.take(iou, tok)

    if pack.use_mask:
        sam_masks, sam_scores = jax.vmap(predict_one)(
            pack.coords, pack.labels, mask_prompts
        )
    else:
        sam_masks, sam_scores = jax.vmap(
            lambda c, l: predict_one(c, l, None)
        )(pack.coords, pack.labels)

    # Optimized gate (:954-958) + empty-prompt fallback (:736-739).
    keep_sam = pack.has_prompt
    if rcfg.optimized:
        keep_sam = keep_sam & (sam_scores >= rcfg.score_gate)

    final_masks = jnp.where(
        keep_sam[:, None, None], sam_masks, xmem_masks > 0.5
    ) & obj_valid[:, None, None]
    final_scores = jnp.where(keep_sam, sam_scores, xmem_scores)
    final_scores = jnp.where(obj_valid, final_scores, -jnp.inf)

    # Score-sorted composite (:960-964): highest score wins overlaps.
    claim = jnp.where(final_masks, final_scores[:, None, None], -jnp.inf)
    winner = jnp.argmax(claim, axis=0)
    any_claim = jnp.any(final_masks, axis=0)
    indexed = jnp.where(any_claim, winner + 1, 0).astype(jnp.int32)

    return RefinementResult(final_masks, final_scores, indexed, keep_sam)


def xmem_object_scores(prob_no_bg: jax.Array) -> jax.Array:
    """Per-object confidence = max probability (base_tracker.py:163-165)."""
    return jnp.max(prob_no_bg, axis=(-2, -1))


def masks_from_prob(prob_with_bg: jax.Array, max_objects: int) -> Tuple[jax.Array, jax.Array]:
    """argmax over (1+O) distribution -> per-object binary masks + indexed map
    (base_tracker.py:153-160)."""
    idx = jnp.argmax(prob_with_bg, axis=0)           # (H, W), 0 = bg
    obj_ids = jnp.arange(1, max_objects + 1)
    masks = idx[None, :, :] == obj_ids[:, None, None]
    return masks.astype(jnp.float32), idx.astype(jnp.int32)
