"""Tracker: the per-frame XMem -> SAM-refinement orchestrator.

Reference: tracker/base_tracker.py BaseTracker (:30-212) — the product's
heart. The torch version crosses the host<->device boundary >=4x per frame
(SURVEY.md §3.1); here the ENTIRE frame step — normalize, pad, XMem
propagate, memory update, argmax, prompt generation, SAM encode+refine,
compositing, painting — is one jit-compiled function; the host only supplies
the next frame and receives the finished mask.

The host-side `Tracker` class keeps the reference's session API:
  track(frame, first_frame_annotation=None) ->
      (mask (H, W) uint8, logits, painted_image, scores)   (:97-212)
  clear_memory()                                            (:1092-1096)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.inference import core
from vosesam_tpu.inference.refinement import (
    masks_from_prob,
    refine_masks,
    xmem_object_scores,
)
from vosesam_tpu.models.layers import Params
from vosesam_tpu.models.sam import predictor
from vosesam_tpu.utils.mask_mapper import MaskMapper
from vosesam_tpu.viz.painter import paint_indexed


@partial(jax.jit, static_argnames=("cfg", "paint"))
def track_frame(
    xmem_params: Params,
    sam_params: Optional[predictor.SamParams],
    state: core.TrackerState,
    frame: jax.Array,                  # (H, W, 3) uint8 RGB
    cfg: FrameworkConfig,
    paint: bool = True,
):
    """One propagation frame, fully on-device. Returns
    (state, indexed_mask (H,W) i32, logits (1+O,H,W), scores (O,), painted)."""
    o = cfg.xmem.max_objects
    state, prob, logits = core.step(xmem_params, state, frame, cfg)
    masks, indexed = masks_from_prob(prob, o)
    scores = xmem_object_scores(prob[1:])

    if cfg.refinement.use_refinement:
        if sam_params is None:
            raise ValueError("refinement enabled but no SAM params given")
        emb = predictor.encode_image(sam_params, frame, cfg.sam)
        res = refine_masks(
            sam_params, emb, masks, logits[1:], scores,
            state.memory.obj_valid, cfg,
        )
        indexed, scores = res.indexed, res.scores

    painted = paint_indexed(frame, indexed, o) if paint else frame
    return state, indexed, logits, scores, painted


@partial(jax.jit, static_argnames=("cfg", "paint"))
def track_first_frame(
    xmem_params: Params,
    state: core.TrackerState,
    frame: jax.Array,
    mask: jax.Array,        # (O, H, W) one-hot
    mask_valid: jax.Array,  # (O,)
    cfg: FrameworkConfig,
    paint: bool = True,
):
    """Annotation frame: GT injection, no refinement (the reference skips SAM
    on the first frame, base_tracker.py:121-131)."""
    o = cfg.xmem.max_objects
    state, prob, logits = core.step_with_mask(
        xmem_params, state, frame, mask, mask_valid, cfg
    )
    masks, indexed = masks_from_prob(prob, o)
    scores = xmem_object_scores(prob[1:])
    painted = paint_indexed(frame, indexed, o) if paint else frame
    return state, indexed, logits, scores, painted


@partial(jax.jit, static_argnames=("o",))
def _paint_chunk(frames, indexed: jax.Array, o: int) -> jax.Array:
    """Batch-paint one chunk — the same paint_indexed as track_frame, so
    chunked painted output is bit-identical to per-frame stepping."""
    return jax.vmap(lambda f, i: paint_indexed(f, i, o))(
        jnp.stack(frames), indexed)


class Tracker:
    """Host-side session wrapper (BaseTracker-compatible surface)."""

    def __init__(
        self,
        xmem_params: Params,
        sam_params: Optional[predictor.SamParams],
        cfg: FrameworkConfig,
        paint: bool = True,
        save_inner_masks_folder: Optional[str] = None,
    ) -> None:
        self.xmem_params = xmem_params
        self.sam_params = sam_params
        self.cfg = cfg
        self.paint = paint
        self.mapper = MaskMapper()
        self.state: Optional[core.TrackerState] = None
        self._frame_hw: Optional[Tuple[int, int]] = None
        # Per-video object-axis capacity: state is allocated at the SEEDED
        # object count (cfg.xmem.max_objects is the validation budget, not
        # the compute width — the reference's tensors are sized by the
        # video's real N, tracker/model/network.py:72-81) and grown via
        # rings.grow_objects on a mid-video annotation. Dead padded slots
        # never change results (validity-masked everywhere), so this only
        # removes compute: decoder/value-encoder/refinement run O=N.
        self._o_cap: Optional[int] = None
        # live_objects hint bookkeeping (MemoryConfig.live_objects): valid
        # while every object was registered before any propagation frame —
        # a mid-video annotation breaks the identical-validity-rows
        # contract, so the hint is dropped (and the step retraces once).
        self._frames_tracked = 0
        self._mid_video_add = False
        self._cfg_cache: dict = {}
        # Debug parity with base_tracker.py:80-89: per-frame dumps of the
        # raw XMem mask vs the SAM-refined mask under
        # <folder>/inner/{xmem_masks,refinement_masks}/<ti>.png.
        self._inner_dir: Optional[str] = save_inner_masks_folder
        self._inner_ti = 0
        if self._inner_dir:
            import os

            for sub in ("xmem_masks", "refinement_masks"):
                os.makedirs(
                    os.path.join(self._inner_dir, "inner", sub), exist_ok=True
                )

    def clear_memory(self) -> None:
        """base_tracker.py:1092-1096 (no cuda cache to empty here)."""
        self.state = None
        self._frame_hw = None
        self._o_cap = None
        self.mapper.clear()
        self._frames_tracked = 0
        self._mid_video_add = False

    def _session_cfg(self, live_hint: Optional[int]) -> FrameworkConfig:
        """cfg specialized to this video: object axis = current capacity,
        MemoryConfig.live_objects = the shared-validity hint (or None).
        Cached per (capacity, hint) — one retrace per distinct pair."""
        o = self._o_cap if self._o_cap is not None else self.cfg.xmem.max_objects
        key = (o, live_hint)
        if key not in self._cfg_cache:
            import dataclasses

            cfg = self.cfg
            if o != cfg.xmem.max_objects:
                cfg = dataclasses.replace(
                    cfg, xmem=dataclasses.replace(cfg.xmem, max_objects=o))
            if live_hint != cfg.memory.live_objects:
                cfg = dataclasses.replace(
                    cfg,
                    memory=dataclasses.replace(
                        cfg.memory, live_objects=live_hint),
                )
            self._cfg_cache[key] = cfg
        return self._cfg_cache[key]

    def _track_cfg(self) -> FrameworkConfig:
        """Session cfg with MemoryConfig.live_objects set from the mapper
        when the shared-validity contract holds (all objects registered up
        front)."""
        n = self.mapper.num_objects
        hint = None if (self._mid_video_add or n == 0) else n
        return self._session_cfg(hint)

    def _ensure_state(self, frame: np.ndarray, n_objects: Optional[int] = None) -> None:
        hw = frame.shape[:2]
        if self.state is None or self._frame_hw != hw:
            self._o_cap = (n_objects if n_objects is not None
                           else self.cfg.xmem.max_objects)
            self.state = core.init_tracker_state(self._session_cfg(None), hw)
            self._frame_hw = hw
        elif n_objects is not None and n_objects > (self._o_cap or 0):
            from vosesam_tpu.memory.rings import grow_objects

            self.state = self.state.replace(
                memory=grow_objects(self.state.memory, n_objects))
            self._o_cap = n_objects

    def track(
        self,
        frame: np.ndarray,                       # (H, W, 3) uint8 RGB
        first_frame_annotation: Optional[np.ndarray] = None,  # (H, W) indexed
    ):
        """base_tracker.py:97-212. Returns (final_mask (H, W) uint8 with the
        ORIGINAL palette labels, logits, painted_image, scores list)."""
        fj = jnp.asarray(frame)

        if first_frame_annotation is not None:
            if self._frames_tracked > 0:
                self._mid_video_add = True
            onehot, new_labels = self.mapper.convert_mask(first_frame_annotation)
            n = self.mapper.num_objects     # highest assigned (contiguous) slot
            budget = self.cfg.xmem.max_objects
            if n > budget:
                raise ValueError(
                    f"{n} objects exceed the static budget max_objects={budget}"
                )
            self._ensure_state(frame, n_objects=n)
            o = self._o_cap
            mask = np.zeros((o,) + frame.shape[:2], np.float32)
            valid = np.zeros((o,), bool)
            for i, lbl in enumerate(new_labels):
                mask[lbl - 1] = onehot[i]
                valid[lbl - 1] = True
            self.state, indexed, logits, scores, painted = track_first_frame(
                self.xmem_params, self.state, fj, jnp.asarray(mask),
                jnp.asarray(valid), self._session_cfg(None), self.paint,
            )
        else:
            self._ensure_state(frame)
            self.state, indexed, logits, scores, painted = track_frame(
                self.xmem_params, self.sam_params, self.state, fj,
                self._track_cfg(), self.paint,
            )
        self._frames_tracked += 1

        indexed_np = np.asarray(indexed)
        if self._inner_dir and first_frame_annotation is None:
            self._dump_inner(np.asarray(logits), indexed_np)
        final = self.mapper.remap_index_mask(indexed_np).astype(np.uint8)
        return (final, np.asarray(logits), np.asarray(painted),
                self._live_scores(np.asarray(scores), indexed_np))

    def _live_scores(self, scores_np: np.ndarray,
                     indexed_np: Optional[np.ndarray] = None) -> list:
        """Reference scores are per object PRESENT in the current frame's
        mask (base_tracker.py:163-165: np.unique(out_mask)[1:]), ordered by
        remapped slot; drop padded slots and objects that vanished from the
        frame (whose refinement score is -inf by construction,
        refinement.py)."""
        live_slots = sorted(self.mapper.remappings.values())
        if not live_slots:
            return scores_np.tolist()
        if indexed_np is not None:
            present = set(np.unique(indexed_np).tolist())
            live_slots = [s for s in live_slots if s in present]
        return [float(scores_np[s - 1]) for s in live_slots]

    def track_batch(self, frames, chunk: int = 4, paint: bool = False):
        """Throughput path: propagate frames through inference/chunked.py —
        XMem scanned over `chunk` frames, ONE batched SAM encode+refinement
        — proven bit-equal to per-frame track (tests/test_chunked.py).

        Must be seeded first (track(frame, annotation)). Only full chunks go
        through the batched path; the remainder falls back to per-frame
        stepping so padded duplicate frames never touch the memory state.
        Returns (masks [(H, W) uint8 original labels...], scores [list...]);
        with `paint=True`, (masks, painted [(H, W, 3) uint8...], scores) —
        painted via the SAME jitted paint as per-frame stepping (one vmapped
        dispatch per chunk), bit-identical output."""
        from vosesam_tpu.inference.chunked import track_chunk

        if self.state is None:
            raise RuntimeError(
                "track_batch needs a seeded tracker: call "
                "track(frame, first_frame_annotation) first")
        masks_out, painted_out, scores_out = [], [], []
        n_full = (len(frames) // chunk) * chunk
        o = self._track_cfg().xmem.max_objects

        def drain(pending):
            idx_np = np.asarray(pending[0])
            sc_np = np.asarray(pending[1])
            pb_np = np.asarray(pending[2]) if pending[2] is not None else None
            for j in range(chunk):
                masks_out.append(
                    self.mapper.remap_index_mask(idx_np[j]).astype(np.uint8))
                scores_out.append(self._live_scores(sc_np[j], idx_np[j]))
                if pb_np is not None:
                    painted_out.append(pb_np[j])

        # Double-buffered: dispatch chunk i before syncing chunk i-1's
        # outputs, so the ~25 ms tunnel round-trip of the host->np
        # conversion overlaps chunk i's device execution instead of
        # stalling the dispatch pipeline once per chunk.
        pending = None
        for i0 in range(0, n_full, chunk):
            # pre-split tuple: one H2D per frame, no per-frame device slice
            # dispatch inside track_chunk (measured ~7 ms/frame at 480p K=8)
            fb = tuple(jnp.asarray(f) for f in frames[i0:i0 + chunk])
            self.state, indexed, scores = track_chunk(
                self.xmem_params, self.sam_params, self.state, fb,
                self._track_cfg(),
            )
            pb = _paint_chunk(fb, indexed, o) if paint else None
            self._frames_tracked += chunk
            if pending is not None:
                drain(pending)
            pending = (indexed, scores, pb)
        if pending is not None:
            drain(pending)
        for f in frames[n_full:]:
            m, _lg, p, s = self.track(f)
            masks_out.append(m)
            scores_out.append(s)
            if paint:
                painted_out.append(p)
        if paint:
            return masks_out, painted_out, scores_out
        return masks_out, scores_out

    def _dump_inner(self, logits: np.ndarray, refined: np.ndarray) -> None:
        """base_tracker.py:80-89 debug artifacts. The pre-refinement XMem
        mask is re-derived from the (refinement-independent) logits."""
        import os

        from vosesam_tpu.eval.palette import save_palette_mask

        self._inner_ti += 1
        xmem_indexed = np.argmax(logits, axis=0).astype(np.uint8)
        base = os.path.join(self._inner_dir, "inner")
        save_palette_mask(
            xmem_indexed,
            os.path.join(base, "xmem_masks", f"{self._inner_ti:05d}.png"),
        )
        save_palette_mask(
            refined.astype(np.uint8),
            os.path.join(base, "refinement_masks", f"{self._inner_ti:05d}.png"),
        )
