"""Static-shape memory state for the XMem three-tier memory hierarchy.

Replaces the reference's dynamically-growing concat tensors
(tracker/inference/kv_memory_store.py) with fixed-capacity buffers + validity
masks, so the entire per-frame step — including memory writes and
consolidation — jits with static shapes.

Layout notes (vs kv_memory_store.py):
  - tokens are (slot, channel) rows, appended contiguously; `count` tracks the
    number of live work slots. Work memory never wraps: consolidation fires
    exactly when count reaches max_work_elements (adds come in HW-token
    chunks and the threshold is a multiple of HW), compacting back to
    min_work_elements — so capacity = max_work_elements suffices.
  - the reference's per-group temporal extents (objects added at the same
    frame share one value tensor, kv_memory_store.py:10-16) become a
    per-(object, slot) `value_valid` mask; keys are shared as in the
    reference.
  - usage is LFU-style: use_count accumulates read affinity, life_count
    counts queries since birth (kv_memory_store.py:92-99).
  - long-term memory is a fixed arena of max_long_term_elements slots;
    LFU-eviction happens implicitly by writing new prototypes over the
    least-used slots (kv_memory_store.py:135-156 evicts LFU to make room).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vosesam_tpu.config import MemoryConfig, XMemConfig


@struct.dataclass
class WorkMemory:
    keys: jax.Array        # (Cw, Ck)
    shrinkage: jax.Array   # (Cw,)
    selection: jax.Array   # (Cw, Ck) — stored for consolidation potentiation
    values: jax.Array      # (O, Cw, Cv)
    value_valid: jax.Array  # (O, Cw) bool
    use_count: jax.Array   # (Cw,) fp32
    life_count: jax.Array  # (Cw,) fp32
    count: jax.Array       # () int32 — live slots in [0, Cw]

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def key_valid(self) -> jax.Array:
        idx = jnp.arange(self.capacity)
        return idx < self.count

    def usage(self) -> jax.Array:
        return self.use_count / jnp.maximum(self.life_count, 1.0)


@struct.dataclass
class LongTermMemory:
    keys: jax.Array        # (Cl, Ck)
    shrinkage: jax.Array   # (Cl,)
    values: jax.Array      # (O, Cl, Cv)
    key_valid: jax.Array   # (Cl,) bool
    value_valid: jax.Array  # (O, Cl) bool
    use_count: jax.Array   # (Cl,)
    life_count: jax.Array  # (Cl,)

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    def usage(self) -> jax.Array:
        return self.use_count / jnp.maximum(self.life_count, 1.0)


@struct.dataclass
class MemoryState:
    work: WorkMemory
    long: LongTermMemory
    hidden: jax.Array      # (O, H16, W16, Ch) sensory memory (GRU state)
    obj_valid: jax.Array   # (O,) bool — which object slots are live


def grow_objects(mem: MemoryState, o_new: int) -> MemoryState:
    """Widen the object axis to `o_new` slots (zero/False padding).

    Supports per-video object-axis sizing: Tracker allocates state at the
    seeded object count (compute scales with the video's real N, like the
    reference's dynamic tensors) and grows it here on a mid-video
    annotation that introduces new objects. New slots are invalid
    everywhere, so results for existing objects are unchanged."""
    o = mem.obj_valid.shape[0]
    if o_new <= o:
        return mem
    pad = o_new - o

    def pad0(a: jax.Array) -> jax.Array:
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    return MemoryState(
        work=mem.work.replace(
            values=pad0(mem.work.values),
            value_valid=pad0(mem.work.value_valid),
        ),
        long=mem.long.replace(
            values=pad0(mem.long.values),
            value_valid=pad0(mem.long.value_valid),
        ),
        hidden=pad0(mem.hidden),
        obj_valid=pad0(mem.obj_valid),
    )


def init_memory(
    mem_cfg: MemoryConfig,
    xmem_cfg: XMemConfig,
    hw_shape: Tuple[int, int],
    dtype=jnp.float32,
) -> MemoryState:
    """Preallocate all memory for a video at key-map resolution (H16, W16)."""
    h16, w16 = hw_shape
    hw = h16 * w16
    cw = mem_cfg.work_capacity(hw)               # max_work_elements
    cl = mem_cfg.max_long_term_elements
    o = xmem_cfg.max_objects
    ck, cv, ch = xmem_cfg.key_dim, xmem_cfg.value_dim, max(xmem_cfg.hidden_dim, 1)
    work = WorkMemory(
        keys=jnp.zeros((cw, ck), dtype),
        shrinkage=jnp.ones((cw,), dtype),
        selection=jnp.zeros((cw, ck), dtype),
        values=jnp.zeros((o, cw, cv), dtype),
        value_valid=jnp.zeros((o, cw), bool),
        use_count=jnp.zeros((cw,), jnp.float32),
        life_count=jnp.zeros((cw,), jnp.float32),
        count=jnp.int32(0),
    )
    long = LongTermMemory(
        keys=jnp.zeros((cl, ck), dtype),
        shrinkage=jnp.ones((cl,), dtype),
        values=jnp.zeros((o, cl, cv), dtype),
        key_valid=jnp.zeros((cl,), bool),
        value_valid=jnp.zeros((o, cl), bool),
        use_count=jnp.zeros((cl,), jnp.float32),
        life_count=jnp.zeros((cl,), jnp.float32),
    )
    return MemoryState(
        work=work,
        long=long,
        hidden=jnp.zeros((o, h16, w16, ch), dtype),
        obj_valid=jnp.zeros((o,), bool),
    )
