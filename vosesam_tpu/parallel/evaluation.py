"""Sequence-data-parallel evaluation: batch independent videos over the mesh.

Each device owns whole videos (per-sequence memory state has no cross-device
traffic), realized with `shard_map` so the per-device body runs the scalar
lax.cond schedule (a plain vmap would convert the mem-frame cond into a
select and run the expensive encode_value branch every frame on every video).

The reference's analogue is running one notebook process per GPU by hand —
here it's one jit (SURVEY.md §2.14 'eval-time DP is the BASELINE.json
requirement')."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.inference import core
from vosesam_tpu.inference.refinement import (
    masks_from_prob,
    refine_masks,
    xmem_object_scores,
)
from vosesam_tpu.models.sam import predictor


def init_batched_state(cfg: FrameworkConfig, frame_hw, batch: int) -> core.TrackerState:
    one = core.init_tracker_state(cfg, frame_hw)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


def _unbatch(tree):
    return jax.tree.map(lambda x: x[0], tree)


def _rebatch(tree):
    return jax.tree.map(lambda x: x[None], tree)


def make_batched_step(cfg: FrameworkConfig, mesh: Mesh, with_refinement: Optional[bool] = None):
    """Returns a jitted step over a video batch sharded on the `data` axis.

    step(xmem_params, sam_params, states, frames (B, H, W, 3), first (B,) bool,
         masks (B, O, H, W), mask_valid (B, O))
      -> (states, indexed (B, H, W), scores (B, O))

    `first` selects GT injection vs propagation per video (all videos in a
    batch advance in lockstep; shorter videos just repeat their last frame —
    the runner masks those results out)."""
    da = cfg.parallel.data_axis
    refine = cfg.refinement.use_refinement if with_refinement is None else with_refinement

    def device_body(xmem_params, sam_params, states, frames, first, masks, mask_valid):
        # per-device batch (B/ndev); loop sequentially over local videos
        def one(state, frame, fst, m, mv):
            def inject(st):
                return core.step_with_mask(xmem_params, st, frame, m, mv, cfg)

            def propagate(st):
                return core.step(xmem_params, st, frame, cfg)

            state, prob, logits = jax.lax.cond(fst, inject, propagate, state)
            pm, indexed = masks_from_prob(prob, cfg.xmem.max_objects)
            scores = xmem_object_scores(prob[1:])
            if refine:
                emb = predictor.encode_image(sam_params, frame, cfg.sam)
                res = refine_masks(
                    sam_params, emb, pm, logits[1:], scores,
                    state.memory.obj_valid, cfg,
                )
                indexed, scores = res.indexed, res.scores
            return state, indexed, scores

        return jax.lax.map(
            lambda args: one(*args), (states, frames, first, masks, mask_valid)
        )

    step = shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(), P(), P(da), P(da), P(da), P(da), P(da)),
        out_specs=(P(da), P(da), P(da)),
        check_vma=False,
    )
    return jax.jit(step)
