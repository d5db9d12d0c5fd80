"""Memory manager: jitted read / write / consolidation over MemoryState.

Reference: tracker/inference/memory_manager.py. The TPU redesign keeps the
exact algorithmic semantics — top-k sparse read over concat(LT, work),
usage (LFU) accounting, prototype consolidation with attention "potentiation"
— but as pure static-shape functions:

  - `match_memory` (memory_manager.py:57-150): one shared similarity over the
    LT+work arena, per-object masked top-k softmax + readout, usage recording.
  - `add_memory` (memory_manager.py:152-190): append an HW-token chunk at the
    live offset; when the work arena hits max_work_elements (it can only hit
    it exactly — adds are HW-sized and the threshold is a multiple of HW),
    consolidation runs as a lax.cond branch with *static* windows:
      candidates = slots [HW, Cw-min_work+HW)   (memory_manager.py:211-243)
      keep       = frame-0 slots + the most recent min_work-HW slots
  - `consolidate` (memory_manager.py:245-285): top-P usage candidates become
    prototype keys; values are attention readouts of candidate values onto
    the prototypes; prototype shrinkage is the readout of candidate
    shrinkage. LT insertion overwrites the P least-used LT slots (invalid
    slots first), which subsumes the reference's LFU eviction
    (kv_memory_store.py:135-156).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import MemoryConfig, ParallelConfig
from vosesam_tpu.memory.rings import LongTermMemory, MemoryState, WorkMemory
from vosesam_tpu.ops.memory_attention import (
    get_similarity,
    read_memory_multiobject,
)


def match_memory(
    state: MemoryState,
    qk: jax.Array,   # (H16, W16, Ck)
    qe: Optional[jax.Array],  # (H16, W16, Ck) selection
    cfg: MemoryConfig,
    pcfg: Optional[ParallelConfig] = None,
) -> Tuple[jax.Array, MemoryState]:
    """Read memory for all objects; returns ((O, H16, W16, Cv), new state)."""
    h16, w16, ck = qk.shape
    q = qk.reshape(-1, ck)
    e = qe.reshape(-1, ck) if qe is not None else None
    work, lt = state.work, state.long

    if cfg.enable_long_term:
        mk = jnp.concatenate([lt.keys, work.keys], 0)
        ms = jnp.concatenate([lt.shrinkage, work.shrinkage], 0)
        mv = jnp.concatenate([lt.values, work.values], 1)
        kv = jnp.concatenate([lt.key_valid, work.key_valid()], 0)
        vv = jnp.concatenate([lt.value_valid, work.value_valid], 1)
    else:
        mk, ms, mv, kv, vv = work.keys, work.shrinkage, work.values, work.key_valid(), work.value_valid

    # Objects with no values anywhere would soft-max over nothing; mask later.
    # Static live-object hint (MemoryConfig.live_objects): dead arena rows
    # produce zero readout/usage by construction, so slicing them off before
    # the read and zero-padding the readout after is bit-identical — and
    # cuts every read path's object axis from max_objects to the live count.
    o_full = mv.shape[0]
    vv_full = vv
    n_live = cfg.live_objects
    slice_live = n_live is not None and 0 < n_live <= o_full
    if slice_live:
        mv = mv[:n_live]
        vv = vv[:n_live]
    n_shards = pcfg.memory_axis_shards if pcfg is not None else 0
    if n_shards > 1:
        # Memory-axis-sharded exact read (ParallelConfig.memory_axis_shards):
        # memory tokens split over the first n devices, queries replicated;
        # candidate top-k gather + psum reduce (parallel/memory_shard.py).
        import numpy as np
        from jax.sharding import Mesh, PartitionSpec as P

        from vosesam_tpu.parallel.compat import shard_map

        from vosesam_tpu.parallel.memory_shard import (
            sharded_memory_read_local,
        )
        from functools import partial

        assert mk.shape[0] % n_shards == 0, (
            f"memory capacity {mk.shape[0]} not divisible by "
            f"memory_axis_shards={n_shards}")
        mesh = Mesh(np.asarray(jax.devices()[:n_shards]), (pcfg.memory_axis,))
        fn = partial(sharded_memory_read_local, top_k=cfg.top_k,
                     axis_name=pcfg.memory_axis)
        ax = pcfg.memory_axis
        # qe=None and qe=ones differ only by a per-query constant, which
        # top-k selection and softmax are invariant to.
        e_sm = e if e is not None else jnp.ones_like(q)
        readout_flat, usage = shard_map(
            fn, mesh=mesh,
            in_specs=(P(ax, None), P(ax), P(None, None), P(None, None),
                      P(None, ax, None), P(None, ax)),
            out_specs=(P(None, None, None), P(ax)),
            check_rep=False,
        )(mk, ms, q, e_sm, mv, kv[None, :] & vv)
    elif slice_live and cfg.fused_read and not cfg.top_k_approx \
            and cfg.top_k <= 32:
        # live_objects contract: validity rows identical across live rows,
        # so one threshold/exp pass serves every object.
        from vosesam_tpu.ops.pallas.memory_read import fused_memory_read_shared

        # All valid slots live below lt_capacity + work.count in the concat
        # layout (work validity is a count-prefix, LT sits in [0, nl)) — the
        # kernel skips memory tiles past this, so read cost tracks the true
        # occupancy instead of the static arena capacity.
        live_end = (lt.capacity if cfg.enable_long_term else 0) + work.count
        readout_flat, usage = fused_memory_read_shared(
            mk, ms, q, e, mv, kv & vv[0], cfg.top_k,
            return_usage=True, live_end=live_end,
            interpret=jax.default_backend() != "tpu",
        )
    elif cfg.fused_read and not cfg.top_k_approx and cfg.top_k <= 32:
        from vosesam_tpu.ops.pallas.memory_read import fused_memory_read

        readout_flat, usage = fused_memory_read(
            mk, ms, q, e, mv, kv[None, :] & vv, cfg.top_k,
            return_usage=True, interpret=jax.default_backend() != "tpu",
        )
    else:
        readout_flat, usage = read_memory_multiobject(
            mk, ms, mv, q, e, kv, vv, cfg.top_k,
            return_usage=True, approx=cfg.top_k_approx,
        )
    cv = mv.shape[-1]
    if slice_live and n_live < o_full:
        readout_flat = jnp.pad(
            readout_flat, ((0, o_full - n_live), (0, 0), (0, 0)))
    readout = readout_flat.reshape(o_full, h16, w16, cv)
    # Zero objects that have no memory at all (no valid value slots).
    has_mem = jnp.any(vv_full, axis=1)
    readout = readout * has_mem[:, None, None, None].astype(readout.dtype)

    # Usage recording (memory_manager.py:109-119).
    nl = lt.capacity
    wu = usage[nl:] if cfg.enable_long_term else usage
    new_work = work.replace(
        use_count=work.use_count + wu,
        life_count=work.life_count + work.key_valid().astype(jnp.float32),
    )
    new_lt = lt
    if cfg.enable_long_term and cfg.enable_long_term_count_usage:
        new_lt = lt.replace(
            use_count=lt.use_count + usage[:nl],
            life_count=lt.life_count + lt.key_valid.astype(jnp.float32),
        )
    return readout, state.replace(work=new_work, long=new_lt)


def add_memory(
    state: MemoryState,
    key: jax.Array,        # (H16, W16, Ck)
    shrinkage: jax.Array,  # (H16, W16, 1)
    selection: jax.Array,  # (H16, W16, Ck)
    value: jax.Array,      # (O, H16, W16, Cv)
    obj_valid: jax.Array,  # (O,) bool
    cfg: MemoryConfig,
    hw: int,
) -> MemoryState:
    """Append one frame's tokens; consolidate when the arena is full."""
    if not cfg.enable_long_term:
        # Reference never trims in this mode (memory grows unboundedly); the
        # static arena instead drops the oldest non-frame-0 chunk to make
        # room before appending.
        state = jax.lax.cond(
            state.work.count + hw > state.work.capacity,
            lambda st: _drop_oldest_chunk(st, hw),
            lambda st: st,
            state,
        )
    work = state.work
    ck = key.shape[-1]
    cv = value.shape[-1]
    o = value.shape[0]
    k = key.reshape(hw, ck)
    s = shrinkage.reshape(hw)
    sel = selection.reshape(hw, ck)
    v = value.reshape(o, hw, cv)

    at = work.count
    vv_new = jnp.broadcast_to(obj_valid[:, None], (o, hw))
    work = work.replace(
        keys=jax.lax.dynamic_update_slice(work.keys, k.astype(work.keys.dtype), (at, 0)),
        shrinkage=jax.lax.dynamic_update_slice(work.shrinkage, s.astype(work.shrinkage.dtype), (at,)),
        selection=jax.lax.dynamic_update_slice(work.selection, sel.astype(work.selection.dtype), (at, 0)),
        values=jax.lax.dynamic_update_slice(work.values, v.astype(work.values.dtype), (0, at, 0)),
        value_valid=jax.lax.dynamic_update_slice(work.value_valid, vv_new, (0, at)),
        use_count=jax.lax.dynamic_update_slice(work.use_count, jnp.zeros(hw), (at,)),
        life_count=jax.lax.dynamic_update_slice(work.life_count, jnp.zeros(hw), (at,)),
        count=work.count + hw,
    )
    state = state.replace(work=work, obj_valid=state.obj_valid | obj_valid)

    if not cfg.enable_long_term:
        return state

    return jax.lax.cond(
        state.work.count >= state.work.capacity,
        lambda st: _consolidate(st, cfg, hw),
        lambda st: st,
        state,
    )


def _drop_oldest_chunk(state: MemoryState, hw: int) -> MemoryState:
    """LT-disabled fallback: shift out the oldest post-frame-0 HW chunk."""
    w = state.work

    def shift(a, axis):
        upper = jax.lax.slice_in_dim(a, hw + hw, a.shape[axis], axis=axis)
        head = jax.lax.slice_in_dim(a, 0, hw, axis=axis)
        pad = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, hw, axis=axis))
        return jnp.concatenate([head, upper, pad], axis=axis)

    w = w.replace(
        keys=shift(w.keys, 0), shrinkage=shift(w.shrinkage, 0),
        selection=shift(w.selection, 0), values=shift(w.values, 1),
        value_valid=shift(w.value_valid, 1), use_count=shift(w.use_count, 0),
        life_count=shift(w.life_count, 0), count=w.count - hw,
    )
    return state.replace(work=w)


def _consolidate(state: MemoryState, cfg: MemoryConfig, hw: int) -> MemoryState:
    """memory_manager.py:211-285 with static windows; see module docstring."""
    work, lt = state.work, state.long
    cw = work.capacity
    min_work = cfg.min_mid_term_frames * hw
    nc = cw - min_work                 # candidate count (static)
    keep_tail = min_work - hw          # recent tokens kept (static)
    # At tiny resolutions the candidate window can be smaller than the
    # prototype budget — clamp (static, shapes stay fixed per resolution).
    p = min(cfg.num_prototypes, nc)
    o = work.values.shape[0]

    # ---- candidate slices (start=hw, length=nc — both static)
    cand_keys = jax.lax.dynamic_slice_in_dim(work.keys, hw, nc, 0)
    cand_shrink = jax.lax.dynamic_slice_in_dim(work.shrinkage, hw, nc, 0)
    cand_sel = jax.lax.dynamic_slice_in_dim(work.selection, hw, nc, 0)
    cand_vals = jax.lax.dynamic_slice_in_dim(work.values, hw, nc, 1)
    cand_vv = jax.lax.dynamic_slice_in_dim(work.value_valid, hw, nc, 1)
    cand_usage = jax.lax.dynamic_slice_in_dim(work.usage(), hw, nc, 0)

    # ---- prototypes: top-P usage candidates (memory_manager.py:251)
    _, proto_idx = jax.lax.top_k(cand_usage, p)
    proto_keys = cand_keys[proto_idx]
    proto_sel = cand_sel[proto_idx]
    proto_vv = jnp.take(cand_vv, proto_idx, axis=1)      # (O, P)

    # ---- potentiation (memory_manager.py:263-284)
    sim = get_similarity(cand_keys, cand_shrink, proto_keys, proto_sel)  # (P, Nc)

    def masked_softmax(s, mask):
        s = jnp.where(mask[None, :], s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.where(mask[None, :], jnp.exp(s - m), 0.0)
        return e / jnp.clip(jnp.sum(e, -1, keepdims=True), 1e-30)

    def per_object(vv_o, vals_o):
        aff = masked_softmax(sim, vv_o)                  # (P, Nc)
        return jnp.dot(aff, vals_o.astype(jnp.float32),
                       preferred_element_type=jnp.float32)

    proto_vals = jax.vmap(per_object)(cand_vv, cand_vals)  # (O, P, Cv)
    aff_full = masked_softmax(sim, jnp.ones(nc, bool))
    proto_shrink = jnp.dot(aff_full, cand_shrink.astype(jnp.float32))

    # ---- write prototypes over the P least-used LT slots (invalid first)
    evict_score = jnp.where(lt.key_valid, -lt.usage(), jnp.inf)
    _, slots = jax.lax.top_k(evict_score, p)
    lt = lt.replace(
        keys=lt.keys.at[slots].set(proto_keys.astype(lt.keys.dtype)),
        shrinkage=lt.shrinkage.at[slots].set(proto_shrink.astype(lt.shrinkage.dtype)),
        values=lt.values.at[:, slots].set(proto_vals.astype(lt.values.dtype)),
        key_valid=lt.key_valid.at[slots].set(True),
        value_valid=lt.value_valid.at[:, slots].set(proto_vv),
        use_count=lt.use_count.at[slots].set(0.0),
        life_count=lt.life_count.at[slots].set(0.0),
    )

    # ---- compact work memory: [0, hw) + most recent keep_tail slots
    def compact(a, axis):
        head = jax.lax.slice_in_dim(a, 0, hw, axis=axis)
        tail = jax.lax.slice_in_dim(a, cw - keep_tail, cw, axis=axis)
        pad_shape = list(a.shape)
        pad_shape[axis] = cw - min_work
        pad = jnp.zeros(pad_shape, a.dtype)
        return jnp.concatenate([head, tail, pad], axis=axis)

    work = work.replace(
        keys=compact(work.keys, 0), shrinkage=compact(work.shrinkage, 0),
        selection=compact(work.selection, 0), values=compact(work.values, 1),
        value_valid=compact(work.value_valid, 1),
        use_count=compact(work.use_count, 0),
        life_count=compact(work.life_count, 0),
        count=jnp.int32(min_work),
    )
    return state.replace(work=work, long=lt)
