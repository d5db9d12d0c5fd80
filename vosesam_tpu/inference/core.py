"""Per-video inference core: the jitted XMem frame step.

Reference: tracker/inference/inference_core.py:43-150. The mutable
InferenceCore object becomes a `TrackerState` pytree threaded through two
pure, jit-compiled functions:

  - `step(params, state, frame)`            — propagation frames
  - `step_with_mask(params, state, frame, mask, mask_valid)` — frame 0 and
    interactive corrections (GT-mask injection, inference_core.py:99-113)

Scheduling (inference_core.py:55-61):
  is_mem_frame     = (ti - last_mem_ti >= mem_every) or mask-given

Sync mode (deep_update_every = -1, the shipped config):
  is_deep_update   = is_mem_frame
  is_normal_update = not is_mem_frame
On normal frames the decoder GRU updates the sensory hidden state; on memory
frames the value-encoder's reinforcer does (and the frame's key/value tokens
enter working memory).

Async mode (deep_update_every >= 0, inference_core.py:18,27,57-61):
  is_normal_update is ALWAYS true — the decoder GRU updates the hidden state
  on every segmented frame, including memory frames (applied BEFORE
  encode_value sees it); the value-encoder's reinforcer additionally replaces
  it only on memory frames where ti - last_deep_update_ti >= deep_update_every
  (last_deep_update_ti starts at -deep_update_every, so the schedule is armed
  from frame 0). Note the reference evaluates the deep-update counter every
  frame but only CONSUMES it inside the mem-frame branch, so deep updates
  effectively fire on the first mem frame at/after the scheduled tick.

Inside jit the decisions are traced scalars handled with lax.cond/where so
only one expensive branch executes per step.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.memory import manager
from vosesam_tpu.memory.rings import MemoryState, init_memory
from vosesam_tpu.models.layers import Params
from vosesam_tpu.models.xmem import network as xnet
from vosesam_tpu.ops.aggregate import soft_aggregate
from vosesam_tpu.ops.image import im_normalize, pad_divide_by, unpad


@struct.dataclass
class TrackerState:
    memory: MemoryState
    curr_ti: jax.Array        # () int32, -1 before the first frame
    last_mem_ti: jax.Array    # () int32
    last_deep_update_ti: jax.Array  # () int32


def init_tracker_state(cfg: FrameworkConfig, frame_hw: Tuple[int, int]) -> TrackerState:
    """Preallocate all per-video state for a given (H, W) frame size."""
    h, w = frame_hw
    ph = -(-h // 16) * 16
    pw = -(-w // 16) * 16
    mem = init_memory(
        cfg.memory, cfg.xmem, (ph // 16, pw // 16), dtype=jnp.dtype(cfg.dtype)
    )
    # Async schedule arms from frame 0: last_deep_update_ti = -deep_update_every
    # (inference_core.py:26-27); in sync mode the field is unused.
    due = cfg.memory.deep_update_every
    return TrackerState(
        memory=mem,
        curr_ti=jnp.int32(-1),
        last_mem_ti=jnp.int32(0),
        last_deep_update_ti=jnp.int32(-due if due >= 0 else 0),
    )


def _encode_and_read(params, cfg, state, frame_p):
    key, shrinkage, selection, feats = xnet.encode_key(params, frame_p)
    readout, mem = manager.match_memory(state.memory, key, selection,
                                        cfg.memory, cfg.parallel)
    return key, shrinkage, selection, feats, readout, mem


def _maybe_memorize(
    params, cfg, state: TrackerState, frame_p, feats, key, shrinkage, selection,
    prob_no_bg, hidden_normal, is_mem_frame, deep_due, obj_valid, hw,
) -> TrackerState:
    """lax.cond wrapper for the memory-frame branch (encode_value +
    add_memory + reinforced hidden), vs the normal branch (decoder hidden).

    `deep_due` is the traced async-schedule scalar (ti - last_deep_update_ti
    >= deep_update_every); in sync mode (deep_update_every < 0) it is ignored
    and every memory frame deep-updates (inference_core.py:57-61). In async
    mode the caller has already applied the decoder hidden to state.memory
    (is_normal_update is unconditionally true there) and passes
    hidden_normal=None."""
    sync = cfg.memory.deep_update_every < 0

    def mem_branch(st: TrackerState) -> TrackerState:
        value, hidden_deep = xnet.encode_value(
            params, frame_p, feats.f16, st.memory.hidden, prob_no_bg,
            obj_valid, cfg.xmem, is_deep_update=True,
        )
        if hidden_deep is None:
            new_hidden = st.memory.hidden
            new_deep_ti = st.last_deep_update_ti
        elif sync:
            new_hidden = hidden_deep
            new_deep_ti = st.curr_ti
        else:
            # encode_value's value output is independent of is_deep_update
            # (network.py:72-87: the flag only gates the reinforcer), so
            # computing the reinforcer and selecting is numerically exact.
            new_hidden = jnp.where(deep_due, hidden_deep, st.memory.hidden)
            new_deep_ti = jnp.where(deep_due, st.curr_ti, st.last_deep_update_ti)
        mem = st.memory.replace(hidden=new_hidden)
        mem = manager.add_memory(
            mem, key, shrinkage, selection, value, obj_valid, cfg.memory, hw
        )
        return st.replace(
            memory=mem,
            last_mem_ti=st.curr_ti,
            last_deep_update_ti=new_deep_ti,
        )

    def normal_branch(st: TrackerState) -> TrackerState:
        if hidden_normal is None:
            return st
        return st.replace(memory=st.memory.replace(hidden=hidden_normal))

    return jax.lax.cond(is_mem_frame, mem_branch, normal_branch, state)


@partial(jax.jit, static_argnames=("cfg", "end"))
def step(
    params: Params,
    state: TrackerState,
    frame: jax.Array,          # (H, W, 3) uint8 or float RGB
    cfg: FrameworkConfig,
    end: bool = False,
) -> Tuple[TrackerState, jax.Array, jax.Array]:
    """Propagate one frame. Returns (state, prob_with_bg (1+O, H, W),
    logits_with_bg (1+O, H, W))."""
    state = state.replace(curr_ti=state.curr_ti + 1)
    frame_n = im_normalize(frame).astype(jnp.dtype(cfg.dtype))
    frame_p, pad = pad_divide_by(frame_n, 16)
    hw = (frame_p.shape[0] // 16) * (frame_p.shape[1] // 16)
    obj_valid = state.memory.obj_valid

    key, shrinkage, selection, feats, readout, mem = _encode_and_read(
        params, cfg, state, frame_p
    )
    state = state.replace(memory=mem)

    hidden_dec, logits_with_bg, prob_with_bg = xnet.segment(
        params, feats, readout.astype(frame_p.dtype), state.memory.hidden,
        obj_valid, cfg.xmem, h_out=True, strip_bg=False,
    )
    prob_no_bg = prob_with_bg[1:]

    is_mem_frame = jnp.logical_and(
        state.curr_ti - state.last_mem_ti >= cfg.memory.mem_every,
        jnp.logical_not(end),
    )
    if cfg.memory.deep_update_every < 0:       # sync mode
        hidden_normal, deep_due = hidden_dec, jnp.bool_(True)
    else:                                      # async: decoder GRU every frame
        if hidden_dec is not None:
            state = state.replace(memory=state.memory.replace(hidden=hidden_dec))
        hidden_normal = None
        deep_due = jnp.logical_and(
            state.curr_ti - state.last_deep_update_ti
            >= cfg.memory.deep_update_every,
            jnp.logical_not(end),
        )
    state = _maybe_memorize(
        params, cfg, state, frame_p, feats, key, shrinkage, selection,
        prob_no_bg, hidden_normal, is_mem_frame, deep_due, obj_valid, hw,
    )
    return (
        state,
        unpad(prob_with_bg, pad, axes=(-2, -1)),
        unpad(logits_with_bg, pad, axes=(-2, -1)),
    )


@partial(jax.jit, static_argnames=("cfg",))
def step_with_mask(
    params: Params,
    state: TrackerState,
    frame: jax.Array,        # (H, W, 3)
    mask: jax.Array,         # (O, H, W) binary per-object ground truth
    mask_valid: jax.Array,   # (O,) bool — which objects the mask labels
    cfg: FrameworkConfig,
) -> Tuple[TrackerState, jax.Array, jax.Array]:
    """GT-mask injection step (frame 0 or interactive correction).

    inference_core.py:99-113: predicted probabilities are zeroed wherever the
    provided mask claims any object; labeled objects take the GT values;
    unlabeled tracked objects keep their predictions. Always a memory frame.
    """
    state = state.replace(curr_ti=state.curr_ti + 1)
    frame_n = im_normalize(frame).astype(jnp.dtype(cfg.dtype))
    frame_p, pad = pad_divide_by(frame_n, 16)
    mask_p, _ = pad_divide_by(mask, 16, axes=(-2, -1))
    hw = (frame_p.shape[0] // 16) * (frame_p.shape[1] // 16)

    obj_valid_new = state.memory.obj_valid | mask_valid
    key, shrinkage, selection, feats, readout, mem = _encode_and_read(
        params, cfg, state, frame_p
    )
    state = state.replace(memory=mem)

    is_first = state.curr_ti == 0

    # Predicted probs for already-tracked objects (zeros on frame 0).
    _, _, prob_with_bg_pred = xnet.segment(
        params, feats, readout.astype(frame_p.dtype), state.memory.hidden,
        state.memory.obj_valid, cfg.xmem, h_out=False, strip_bg=False,
    )
    pred_no_bg = jnp.where(is_first, 0.0, prob_with_bg_pred[1:])

    mask_regions = jnp.sum(mask_p, axis=0) > 0.5
    pred_no_bg = jnp.where(mask_regions[None], 0.0, pred_no_bg)
    merged = jnp.where(mask_valid[:, None, None], mask_p.astype(pred_no_bg.dtype), pred_no_bg)
    prob_with_bg, logits_with_bg = soft_aggregate(
        merged, obj_valid_new, dim=0, return_logits=True
    )

    # Fresh hidden state for newly-introduced objects (create_hidden_state).
    newly = mask_valid & jnp.logical_not(state.memory.obj_valid)
    hidden = jnp.where(
        newly[:, None, None, None], 0.0, state.memory.hidden
    )
    state = state.replace(memory=state.memory.replace(hidden=hidden))

    # Mask frames are always memory frames; in async mode the reinforcer
    # still only fires when the deep-update counter has elapsed
    # (inference_core.py:57-61 — frame 0 always qualifies since the counter
    # starts at -deep_update_every).
    if cfg.memory.deep_update_every < 0:
        deep_due = jnp.bool_(True)
    else:
        deep_due = (
            state.curr_ti - state.last_deep_update_ti
            >= cfg.memory.deep_update_every
        )
    state = _maybe_memorize(
        params, cfg, state, frame_p, feats, key, shrinkage, selection,
        prob_with_bg[1:], None, jnp.bool_(True), deep_due, obj_valid_new, hw,
    )
    return (
        state,
        unpad(prob_with_bg, pad, axes=(-2, -1)),
        unpad(logits_with_bg, pad, axes=(-2, -1)),
    )
