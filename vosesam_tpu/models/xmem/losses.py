"""XMem training losses.

Reference: tracker/model/losses.py — dice loss (:8), bootstrapped
cross-entropy with a top-p hard-pixel schedule (:23-43), and the per-frame
LossComputer (:46-68). Functional JAX; the bootstrap warmup is driven by the
iteration counter passed in (no mutable state)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def dice_loss(pred_logits: jax.Array, gt: jax.Array, valid: jax.Array) -> jax.Array:
    """pred_logits/gt: (O, H, W) per-object; valid: (O,). losses.py:8-20."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    g = gt.astype(jnp.float32)
    num = 2.0 * jnp.sum(p * g, axis=(-2, -1)) + 1.0
    den = jnp.sum(p, axis=(-2, -1)) + jnp.sum(g, axis=(-2, -1)) + 1.0
    loss = 1.0 - num / den
    v = valid.astype(jnp.float32)
    return jnp.sum(loss * v) / jnp.maximum(jnp.sum(v), 1.0)


def bootstrapped_ce(
    logits: jax.Array,      # (1+O, H, W) aggregated logits (bg first)
    target: jax.Array,      # (H, W) int32 labels in [0, O]
    it: jax.Array,          # () current iteration (for the warmup schedule)
    top_p: float = 0.15,
    warmup_start: int = 20000,
    warmup_end: int = 70000,
) -> jax.Array:
    """Top-p hard-pixel CE (losses.py:23-43): start averaging over all
    pixels, linearly anneal to the hardest `top_p` fraction."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=0)
    h, w = target.shape
    nll = -jnp.take_along_axis(
        logp.reshape(logp.shape[0], -1), target.reshape(1, -1), axis=0
    )[0]                                          # (H*W,)

    frac = jnp.clip(
        (it.astype(jnp.float32) - warmup_start) / float(warmup_end - warmup_start),
        0.0, 1.0,
    )
    this_p = 1.0 + frac * (top_p - 1.0)           # 1.0 -> top_p
    n = nll.shape[0]
    k = jnp.maximum((this_p * n).astype(jnp.int32), 1)
    sorted_nll = jnp.sort(nll)[::-1]              # descending
    idx = jnp.arange(n)
    selected = jnp.where(idx < k, sorted_nll, 0.0)
    return jnp.sum(selected) / k.astype(jnp.float32)


def frame_loss(
    agg_logits: jax.Array,   # (1+O, H, W)
    obj_logits: jax.Array,   # (O, H, W) pre-aggregation per-object logits
    gt_indexed: jax.Array,   # (H, W) int32
    obj_valid: jax.Array,    # (O,)
    it: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-frame ce + dice (losses.py:52-68)."""
    ce = bootstrapped_ce(agg_logits, gt_indexed, it)
    o = obj_logits.shape[0]
    gt_onehot = (
        gt_indexed[None] == jnp.arange(1, o + 1)[:, None, None]
    )
    dl = dice_loss(obj_logits, gt_onehot, obj_valid)
    total = ce + dl
    return total, {"ce": ce, "dice": dl, "total": total}
