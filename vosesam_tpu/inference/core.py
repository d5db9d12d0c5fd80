"""Per-video inference core: the jitted XMem frame step.

Reference: tracker/inference/inference_core.py:43-150. The mutable
InferenceCore object becomes a `TrackerState` pytree threaded through two
pure, jit-compiled functions:

  - `step(params, state, frame)`            — propagation frames
  - `step_with_mask(params, state, frame, mask, mask_valid)` — frame 0 and
    interactive corrections (GT-mask injection, inference_core.py:99-113)

Scheduling (inference_core.py:55-61), with deep_update_every = -1 (sync
mode — the shipped config):
  is_mem_frame     = (ti - last_mem_ti >= mem_every) or mask-given
  is_deep_update   = is_mem_frame
  is_normal_update = not is_mem_frame
On normal frames the decoder GRU updates the sensory hidden state; on memory
frames the value-encoder's reinforcer does (and the frame's key/value tokens
enter working memory). Inside jit the decision is a traced scalar handled
with lax.cond so only one expensive branch executes per step.
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
    return TrackerState(
        memory=mem,
        curr_ti=jnp.int32(-1),
        last_mem_ti=jnp.int32(0),
        last_deep_update_ti=jnp.int32(0),
    )


def _encode_and_read(params, cfg, state, frame_p):
    key, shrinkage, selection, feats = xnet.encode_key(params, frame_p)
    readout, mem = manager.match_memory(state.memory, key, selection,
                                        cfg.memory, cfg.parallel)
    return key, shrinkage, selection, feats, readout, mem


def _maybe_memorize(
    params, cfg, state: TrackerState, frame_p, feats, key, shrinkage, selection,
    prob_no_bg, hidden_normal, is_mem_frame, obj_valid, hw,
) -> TrackerState:
    """lax.cond wrapper for the memory-frame branch (encode_value +
    add_memory + reinforced hidden), vs the normal branch (decoder hidden)."""

    def mem_branch(st: TrackerState) -> TrackerState:
        value, hidden_deep = xnet.encode_value(
            params, frame_p, feats.f16, st.memory.hidden, prob_no_bg,
            obj_valid, cfg.xmem, is_deep_update=True,
        )
        mem = st.memory.replace(hidden=hidden_deep if hidden_deep is not None else st.memory.hidden)
        mem = manager.add_memory(
            mem, key, shrinkage, selection, value, obj_valid, cfg.memory, hw
        )
        return st.replace(
            memory=mem,
            last_mem_ti=st.curr_ti,
            last_deep_update_ti=st.curr_ti,
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
    state = _maybe_memorize(
        params, cfg, state, frame_p, feats, key, shrinkage, selection,
        prob_no_bg, hidden_dec, is_mem_frame, obj_valid, hw,
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

    state = _maybe_memorize(
        params, cfg, state, frame_p, feats, key, shrinkage, selection,
        prob_with_bg[1:], None, jnp.bool_(True), obj_valid_new, hw,
    )
    return (
        state,
        unpad(prob_with_bg, pad, axes=(-2, -1)),
        unpad(logits_with_bg, pad, axes=(-2, -1)),
    )
