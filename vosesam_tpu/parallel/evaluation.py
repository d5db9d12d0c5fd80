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


def make_batched_first_step(cfg: FrameworkConfig, mesh: Mesh):
    """GT-injection step for a lockstep video batch — NO refinement (the
    reference skips SAM on annotated frames, base_tracker.py:121-131).

    step(xmem_params, states, frames (B,H,W,3), masks (B,O,H,W), valid (B,O))
      -> (states, indexed (B,H,W), scores (B,O))"""
    da = cfg.parallel.data_axis

    def device_body(xmem_params, states, frames, masks, mask_valid):
        def one(state, frame, m, mv):
            state, prob, _ = core.step_with_mask(
                xmem_params, state, frame, m, mv, cfg)
            _, indexed = masks_from_prob(prob, cfg.xmem.max_objects)
            return state, indexed, xmem_object_scores(prob[1:])

        return jax.lax.map(
            lambda args: one(*args), (states, frames, masks, mask_valid))

    step = shard_map(
        device_body, mesh=mesh,
        in_specs=(P(), P(da), P(da), P(da), P(da)),
        out_specs=(P(da), P(da), P(da)),
        check_vma=False,
    )
    return jax.jit(step)


def make_batched_prop_step(cfg: FrameworkConfig, mesh: Mesh,
                           with_refinement: Optional[bool] = None):
    """Propagation step for a lockstep video batch (XMem + optional SAM
    refinement — the same chain as inference/tracker.py track_frame).

    step(xmem_params, sam_params, states, frames (B,H,W,3))
      -> (states, indexed (B,H,W), scores (B,O))"""
    da = cfg.parallel.data_axis
    refine = (cfg.refinement.use_refinement
              if with_refinement is None else with_refinement)

    def device_body(xmem_params, sam_params, states, frames):
        def one(state, frame):
            state, prob, logits = core.step(xmem_params, state, frame, cfg)
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

        return jax.lax.map(lambda args: one(*args), (states, frames))

    step = shard_map(
        device_body, mesh=mesh,
        in_specs=(P(), P(), P(da), P(da)),
        out_specs=(P(da), P(da), P(da)),
        check_vma=False,
    )
    return jax.jit(step)


def make_batched_chunk_step(cfg: FrameworkConfig, mesh: Mesh):
    """Chunked propagation for a lockstep video batch: each device runs the
    ONE-JIT chunked tracker (inference/chunked.py track_chunk_fused — XMem
    lax.scan + one batched SAM encode/refine over the K frames) on its own
    videos. This composes the two throughput axes: videos data-parallel
    over the mesh AND the chunked fast path within each lane — the
    production eval config for a slice (on a real pod the per-frame batched
    step would leave every device dispatch-bound between frames).

    step(xmem_params, sam_params, states, frames (B, K, H, W, 3))
      -> (states, indexed (B, K, H, W), scores (B, K, O))"""
    from vosesam_tpu.inference.chunked import track_chunk_fused

    da = cfg.parallel.data_axis

    def device_body(xmem_params, sam_params, states, frames):
        def one(args):
            st, fr = args
            return track_chunk_fused(xmem_params, sam_params, st, fr, cfg)

        return jax.lax.map(one, (states, frames))

    step = shard_map(
        device_body, mesh=mesh,
        in_specs=(P(), P(), P(da), P(da)),
        out_specs=(P(da), P(da), P(da)),
        check_vma=False,
    )
    return jax.jit(step)


class BatchedGenerator:
    """Dataset-level lockstep multi-video generator over the `data` mesh axis.

    The reference evaluates LVOS one video at a time on one GPU
    (tools/runner.py:226-284); this drives B videos in lockstep, sharded
    whole-videos-per-device (per-sequence memory state, zero cross-device
    traffic — SURVEY §2.14 / BASELINE config 5, 'LVOS batched across a
    slice').

    Semantics vs the sequential Tracker path:
      - uneven lengths: all videos advance to the longest length; finished
        videos keep stepping on their repeated last frame in their own state
        (results past a video's true length are DROPPED, so its outputs are
        identical to stopping at its last frame — memory writes on dead
        frames never feed back into kept outputs);
      - per-video labels: each video's palette labels are remapped to
        contiguous slots by its own MaskMapper and written back on output
        (utils/mask_mapper.py — same as Tracker.track);
      - frame 0 injects the template with NO refinement, propagation frames
        refine per cfg.refinement (same as track_first_frame/track_frame);
      - batch padding: B is padded to a multiple of the data-axis size with
        copies of video 0; padded lanes are dropped.

    All videos in one run() must share (H, W) — group by resolution upstream
    (eval/runner.py does)."""

    def __init__(self, xmem_params, sam_params, cfg: FrameworkConfig,
                 mesh: Optional[Mesh] = None, chunk: int = 1) -> None:
        """`chunk > 1` routes propagation through the one-jit chunked
        tracker per lane (make_batched_chunk_step) — identical masks to the
        per-frame path (tests/test_batched_runner.py); the final short
        chunk is padded by repeating each video's current frame and the
        padded results are dropped."""
        from vosesam_tpu.parallel import mesh as meshlib

        self.xmem_params = xmem_params
        self.sam_params = sam_params
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(cfg.parallel)
        self._meshlib = meshlib
        self.chunk = max(1, int(chunk))
        self.first_step = make_batched_first_step(cfg, self.mesh)
        self.prop_step = (make_batched_prop_step(cfg, self.mesh)
                          if self.chunk == 1 else None)
        self.chunk_step = (make_batched_chunk_step(cfg, self.mesh)
                           if self.chunk > 1 else None)

    def run(self, videos, templates, return_states: bool = False):
        """videos: list of per-video frame lists ((H, W, 3) uint8, equal
        H, W across videos); templates: list of (H, W) indexed uint8 masks.
        Returns a list of {"masks": [(H, W) uint8 ...], "scores": [list ...]}
        (one mask/score-list per true frame of each video).

        `return_states=True` additionally returns the final batched
        TrackerState (leading lane axis, padded lanes included) — lets
        callers inspect per-lane memory (e.g. LT occupancy/eviction in the
        long-lane soak test) or checkpoint a run."""
        import numpy as np

        from vosesam_tpu.utils.mask_mapper import MaskMapper

        assert len(videos) == len(templates) > 0
        hw = videos[0][0].shape[:2]
        for v in videos:
            if v[0].shape[:2] != hw:
                raise ValueError(
                    "all videos in one batched run must share (H, W); "
                    "group by resolution first")

        dp = self.mesh.devices.shape[0]
        n_true = len(videos)
        b = -(-n_true // dp) * dp
        pad_idx = list(range(n_true)) + [0] * (b - n_true)
        lens = [len(videos[i]) for i in pad_idx]
        t_max = max(lens)
        o = self.cfg.xmem.max_objects

        mappers = []
        masks0 = np.zeros((b, o) + hw, np.float32)
        valid0 = np.zeros((b, o), bool)
        for lane, vi in enumerate(pad_idx):
            mapper = MaskMapper()
            onehot, new_labels = mapper.convert_mask(templates[vi])
            if mapper.num_objects > o:
                raise ValueError(
                    f"video {vi}: {mapper.num_objects} objects exceed "
                    f"max_objects={o}")
            for i, lbl in enumerate(new_labels):
                masks0[lane, lbl - 1] = onehot[i]
                valid0[lane, lbl - 1] = True
            mappers.append(mapper)

        states = init_batched_state(self.cfg, hw, b)
        states = self._meshlib.shard_batch(states, self.mesh, self.cfg.parallel)

        def frames_at(t):
            batch = np.stack(
                [videos[vi][min(t, lens[lane] - 1)]
                 for lane, vi in enumerate(pad_idx)])
            return self._meshlib.shard_batch(
                jnp.asarray(batch), self.mesh, self.cfg.parallel)

        per_t_indexed, per_t_scores = [], []
        pending = None  # double-buffer: sync the previous step's results
        # while the next step executes

        def drain(p):
            idx, sc, keep = p
            idx, sc = np.asarray(idx), np.asarray(sc)
            if idx.ndim == 3:           # per-frame step: (B, H, W)
                per_t_indexed.append(idx)
                per_t_scores.append(sc)
            else:                       # chunk step: (B, K, H, W), keep K'
                for k in range(keep):
                    per_t_indexed.append(idx[:, k])
                    per_t_scores.append(sc[:, k])

        states, indexed, scores = self.first_step(
            self.xmem_params, states, frames_at(0),
            jnp.asarray(masks0), jnp.asarray(valid0))
        pending = (indexed, scores, 1)

        if self.chunk == 1:
            for t in range(1, t_max):
                states, indexed, scores = self.prop_step(
                    self.xmem_params, self.sam_params, states, frames_at(t))
                drain(pending)
                pending = (indexed, scores, 1)
        else:
            k = self.chunk
            for t0 in range(1, t_max, k):
                keep = min(k, t_max - t0)
                # pad the tail chunk by repeating each lane's current frame
                # (clamped indexing below already repeats last frames for
                # finished videos; padded results are dropped via `keep`)
                batch = np.stack([
                    np.stack([videos[vi][min(t0 + kk, lens[lane] - 1)]
                              for kk in range(k)])
                    for lane, vi in enumerate(pad_idx)])
                fb = self._meshlib.shard_batch(
                    jnp.asarray(batch), self.mesh, self.cfg.parallel)
                states, indexed, scores = self.chunk_step(
                    self.xmem_params, self.sam_params, states, fb)
                drain(pending)
                pending = (indexed, scores, keep)
        drain(pending)

        out = []
        for lane in range(n_true):
            mapper = mappers[lane]
            live_slots = sorted(mapper.remappings.values())
            slot_to_orig = {slot: orig
                            for orig, slot in mapper.remappings.items()}
            masks, scores, label_scores = [], [], []
            for t in range(len(videos[lane])):
                idx = per_t_indexed[t][lane]
                masks.append(mapper.remap_index_mask(idx).astype(np.uint8))
                present = set(np.unique(idx).tolist())
                slots = [s for s in live_slots if s in present]
                scores.append([float(per_t_scores[t][lane][s - 1]) for s in slots])
                # original-palette-label -> score (what AP metrics consume;
                # the flat `scores` list is slot-ordered and can't be
                # re-keyed without the lane's private MaskMapper)
                label_scores.append({
                    slot_to_orig[s]: float(per_t_scores[t][lane][s - 1])
                    for s in slots})
            out.append({"masks": masks, "scores": scores,
                        "label_scores": label_scores})
        if return_states:
            return out, states
        return out
