"""STM soft-aggregation of per-object probabilities.

Reference: tracker/model/aggregate.py:6-17 — given per-object foreground
probabilities, the background probability is prod(1 - p_i); all (bg + N)
channels are passed through a logit transform and re-normalized by softmax.

The TPU version carries a static padded object axis with a validity mask:
invalid objects contribute p=0 (so they do not perturb the background
product) and are forced to -inf logits before the softmax.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def soft_aggregate(
    prob: jax.Array,
    valid: Optional[jax.Array] = None,
    dim: int = 0,
    return_logits: bool = False,
    eps: float = 1e-7,
) -> Tuple[jax.Array, jax.Array] | jax.Array:
    """prob: (N, ...) per-object fg probabilities in [0, 1].

    valid: optional (N,) bool — padded-object mask. Returns (1+N, ...)
    aggregated distribution (background first), and logits if requested.
    Always computes in fp32 (log/exp precision) regardless of input dtype.
    """
    prob = prob.astype(jnp.float32)
    if valid is not None:
        vshape = (prob.shape[dim],) + (1,) * (prob.ndim - 1)
        v = jnp.reshape(valid, vshape)
        prob = jnp.where(v, prob, 0.0)

    bg = jnp.prod(jnp.clip(1.0 - prob, eps, 1.0), axis=dim, keepdims=True)
    stacked = jnp.concatenate([bg, prob], axis=dim)
    logits = jnp.log(jnp.clip(stacked, eps, 1.0 - eps)) - jnp.log1p(
        -jnp.clip(stacked, eps, 1.0 - eps)
    )
    if valid is not None:
        vfull = jnp.concatenate(
            [jnp.ones_like(v[:1], dtype=bool), v.astype(bool)], axis=dim
        )
        logits = jnp.where(vfull, logits, -1e9)
    out = jax.nn.softmax(logits, axis=dim)
    if return_logits:
        return out, logits
    return out
