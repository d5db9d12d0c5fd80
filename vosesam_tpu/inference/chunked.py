"""Chunked tracking: scan XMem, batch SAM refinement across frames.

TPU-first throughput design (SURVEY.md §7 hard part 5: "possibly batching
frames' encodes"): the only frame-to-frame dependency in the pipeline is the
XMem memory state — SAM refinement is a pure function of (frame, XMem
output) and never feeds back (base_tracker.py:178 runs it after the memory
update). So a chunk of K frames runs as:

  1. lax.scan of the XMem step over the chunk  (sequential, cheap)
  2. ONE batched SAM encode of all K frames    (vmap -> K x 4096-token ViT)
  3. ONE batched refinement                     (vmap over frames x objects)

Step 2/3 turn the ViT's many small ops into K-x bigger ones — this chip's
effective FLOPs scale strongly with op size — and cut per-op dispatch
overhead by ~K. Latency rises by a chunk; throughput (the benchmark metric)
multiplies."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.inference import core
from vosesam_tpu.inference.refinement import (
    masks_from_prob,
    refine_masks,
    xmem_object_scores,
)
from vosesam_tpu.models.layers import Params
from vosesam_tpu.models.sam import predictor


@partial(jax.jit, static_argnames=("cfg",))
def track_chunk(
    xmem_params: Params,
    sam_params,
    state: core.TrackerState,
    frames: jax.Array,          # (K, H, W, 3) uint8
    cfg: FrameworkConfig,
) -> Tuple[core.TrackerState, jax.Array, jax.Array]:
    """Track K propagation frames. Returns (state, indexed (K, H, W) i32,
    scores (K, O))."""
    o = cfg.xmem.max_objects

    def xmem_step(st, frame):
        st, prob, logits = core.step(xmem_params, st, frame, cfg)
        masks, indexed = masks_from_prob(prob, o)
        scores = xmem_object_scores(prob[1:])
        return st, (masks, logits[1:], scores, indexed, st.memory.obj_valid)

    state, (masks, obj_logits, scores, indexed, ovalid) = jax.lax.scan(
        xmem_step, state, frames
    )

    if not cfg.refinement.use_refinement:
        return state, indexed, scores

    def refine_one(frame, m, lg, sc, ov):
        emb = predictor.encode_image(sam_params, frame, cfg.sam)
        res = refine_masks(sam_params, emb, m, lg, sc, ov, cfg)
        return res.indexed, res.scores

    r_indexed, r_scores = jax.vmap(refine_one)(
        frames, masks, obj_logits, scores, ovalid
    )
    return state, r_indexed, r_scores
