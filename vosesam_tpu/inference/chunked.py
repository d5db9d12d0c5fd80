"""Chunked tracking: scan XMem, batch SAM refinement across frames.

TPU-first throughput design (SURVEY.md §7 hard part 5: "possibly batching
frames' encodes"): the only frame-to-frame dependency in the pipeline is the
XMem memory state — SAM refinement is a pure function of (frame, XMem
output) and never feeds back (base_tracker.py:178 runs it after the memory
update). So a chunk of K frames runs as:

  1. the XMem step over each frame of the chunk  (sequential, cheap)
  2. ONE batched SAM encode of all K frames      (vmap -> K x 2304-token ViT)
  3. ONE batched refinement                      (vmap over frames x objects)

Step 2/3 turn the ViT's many small ops into K-x bigger ones — this chip's
effective FLOPs scale strongly with op size — and cut per-op dispatch
overhead by ~K. Latency rises by a chunk; throughput (the benchmark metric)
multiplies.

Two drivers for step 1, identical numerics (same core.step, same order):

  - `track_chunk` (default, PIPELINED): a host loop of per-frame XMem jit
    dispatches followed by the one batched refine jit. Dispatches pipeline
    on the device queue, and each step's arena updates run in place.
  - `track_chunk_fused` (one jit per chunk): the XMem steps become a
    lax.scan inside a single program. Measured SLOWER on the tunneled v5e
    (scripts/exp_chunk_unroll.py: scan 22.1 ms/frame, scan unroll=K 25.4,
    per-frame jits 15.8 — the while-loop carry blocks in-place arena
    updates, and unrolling does not recover it), but it is the right shape
    when the whole chunk must live inside one traced program (e.g. under an
    outer shard_map/jit).
"""

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


def _xmem_chunk_step_impl(
    xmem_params: Params, state: core.TrackerState, frame: jax.Array,
    cfg: FrameworkConfig,
):
    """One XMem propagation step + the per-frame outputs the refinement
    stage consumes. The same math as track_chunk_fused's scan body."""
    st, prob, logits = core.step(xmem_params, state, frame, cfg)
    masks, indexed = masks_from_prob(prob, cfg.xmem.max_objects)
    scores = xmem_object_scores(prob[1:])
    return st, (masks, logits[1:], scores, indexed, st.memory.obj_valid)


_xmem_chunk_step = jax.jit(_xmem_chunk_step_impl, static_argnames=("cfg",))
# Donating variant: the input state's arena buffers (~100 MB of static
# work/LT arenas) are reused in place instead of copied on every modified
# array. Only safe when the caller does NOT reuse the passed state afterward
# (the steady-state bench/eval loop); donation is a no-op on CPU.
_xmem_chunk_step_donate = jax.jit(
    _xmem_chunk_step_impl, static_argnames=("cfg",), donate_argnums=(1,))


@partial(jax.jit, static_argnames=("cfg",))
def _refine_chunk(
    sam_params, frames: Tuple[jax.Array, ...], per_frame: Tuple,
    cfg: FrameworkConfig,
):
    """Batched SAM encode + refinement over the whole chunk. `frames` is the
    K-tuple of (H, W, 3) frames and `per_frame` the K-tuple of
    _xmem_chunk_step output tuples; stacking happens inside the trace (no
    extra host-dispatched concat ops)."""
    fstack = jnp.stack(frames)
    masks, obj_logits, scores, _indexed, ovalid = (
        jnp.stack(t) for t in zip(*per_frame)
    )

    def refine_one(frame, m, lg, sc, ov):
        emb = predictor.encode_image(sam_params, frame, cfg.sam)
        res = refine_masks(sam_params, emb, m, lg, sc, ov, cfg)
        return res.indexed, res.scores

    return jax.vmap(refine_one)(fstack, masks, obj_logits, scores, ovalid)


@partial(jax.jit, static_argnames=("cfg",))
def _encode_chunk(
    sam_params, frames: Tuple[jax.Array, ...], cfg: FrameworkConfig,
):
    """ONE batched ViT encode of the K-frame chunk (no refinement). Split
    out of _refine_chunk so the pipelined driver can dispatch the chunk's
    dominant device program (~40 ms/frame encode) BEFORE the K latency-bound
    XMem step dispatches: while the device executes the encode, the host
    enqueues the XMem steps, hiding their per-dispatch host latency (the
    device would otherwise idle between them)."""
    fstack = jnp.stack(frames)
    return jax.vmap(
        lambda f: predictor.encode_image(sam_params, f, cfg.sam))(fstack)


@partial(jax.jit, static_argnames=("cfg",))
def _refine_chunk_pre(
    sam_params, embs, per_frame: Tuple, cfg: FrameworkConfig,
):
    """Batched refinement with PRE-computed embeddings (_encode_chunk).
    Same math as _refine_chunk minus the encode."""
    masks, obj_logits, scores, _indexed, ovalid = (
        jnp.stack(t) for t in zip(*per_frame)
    )

    def refine_one(emb, m, lg, sc, ov):
        res = refine_masks(sam_params, emb, m, lg, sc, ov, cfg)
        return res.indexed, res.scores

    return jax.vmap(refine_one)(embs, masks, obj_logits, scores, ovalid)


def track_chunk(
    xmem_params: Params,
    sam_params,
    state: core.TrackerState,
    frames,                     # (K, H, W, 3) uint8 array OR K-tuple/list
    cfg: FrameworkConfig,
    donate_state: bool = False,
) -> Tuple[core.TrackerState, jax.Array, jax.Array]:
    """Track K propagation frames (pipelined driver). Returns
    (state, indexed (K, H, W) i32, scores (K, O)).

    Host-level: K per-frame XMem dispatches + one batched refine dispatch.
    Bit-equal to per-frame stepping AND to track_chunk_fused
    (tests/test_chunked.py).

    `frames` may be a pre-split K-tuple of (H, W, 3) frames — saves one
    device slice dispatch per frame vs a stacked (K, H, W, 3) array.
    `donate_state=True` donates the input state's arena buffers to each
    step (in-place updates, no arena copies) — the caller must not touch
    the PASSED `state` afterward (use the returned one)."""
    if not isinstance(frames, (tuple, list)):
        frames = tuple(frames[i] for i in range(frames.shape[0]))
    refine = cfg.refinement.use_refinement
    if refine:
        # Dispatch the chunk's dominant device program FIRST: the batched
        # encode only needs the frames, so it executes on the device while
        # the host is still enqueuing the K latency-bound XMem dispatches
        # below (the device no longer idles between them).
        embs = _encode_chunk(sam_params, tuple(frames), cfg)
    step_jit = _xmem_chunk_step_donate if donate_state else _xmem_chunk_step
    per_frame = []
    for f in frames:
        state, outs = step_jit(xmem_params, state, f, cfg)
        per_frame.append(outs)

    if not refine:
        indexed = jnp.stack([o[3] for o in per_frame])
        scores = jnp.stack([o[2] for o in per_frame])
        return state, indexed, scores

    r_indexed, r_scores = _refine_chunk_pre(
        sam_params, embs, tuple(per_frame), cfg)
    return state, r_indexed, r_scores


@partial(jax.jit, static_argnames=("cfg",))
def track_chunk_fused(
    xmem_params: Params,
    sam_params,
    state: core.TrackerState,
    frames: jax.Array,          # (K, H, W, 3) uint8
    cfg: FrameworkConfig,
) -> Tuple[core.TrackerState, jax.Array, jax.Array]:
    """Track K propagation frames in ONE traced program (XMem lax.scan +
    batched refine). Same numerics as track_chunk; see module docstring for
    when to prefer which."""
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
