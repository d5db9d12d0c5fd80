"""Fused XMem memory-read kernel (Pallas TPU): exact top-k threshold →
sparse softmax → value readout, with the per-key usage side-output.

Reference semantics: tracker/model/memory_util.py:41-80 (top-k softmax +
readout) driven per object group by memory_manager.py:57-150. The similarity
itself (memory_util.py:7-39) is computed ONCE in XLA (`get_similarity`) —
it is shared by every object, and one big MXU matmul beats per-tile
recomputation; the (Q, M) fp32 sim buffer is streamed through this kernel.

Why a kernel (SURVEY §7 step 2's "north-star"): the XLA chain materializes a
separate (Q, M) affinity per object (~900 MB of HBM traffic per frame at
DAVIS-480p with long-term memory) and `lax.top_k` over M lowers to a sort
costing tens of ms. Here, per (object, query-tile):

  phase A: stream sim tiles; per-tile exact top-k via k-step max extraction
           (descending) bitonic-merged into a running per-query top-32
           (O(1) VMEM); at the last tile the k-th lane is the exact
           threshold, and the softmax denominator l = Σ exp(top_i − max)
           falls straight out of the running buffer — no second sweep;
  phase B: stream sim tiles again; admitted entries (sim ≥ threshold)
           contribute exp(sim − max) · mv to the readout accumulator (MXU)
           and exp/l column-sums to the usage output.

Tie semantics: within-tile duplicate values collapse during extraction, so
with duplicates inside the top-k the threshold (and l) can admit slightly
more mass than the XLA path; both already deviate from torch.topk's
arbitrary tie selection (memory_util.py:45-54). Ties are measure-zero for
continuous similarities.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vosesam_tpu.ops.memory_attention import get_similarity

NEG_INF = -1e30


def _bitonic_merge_desc(x64: jax.Array) -> jax.Array:
    """Descending bitonic merge of a (TQ, 64) bitonic sequence (first 32
    descending, last 32 ascending) — 6 roll/compare-exchange stages."""
    n = x64.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x64.shape, 1)
    for d in (32, 16, 8, 4, 2, 1):
        up = pltpu.roll(x64, n - d, 1)    # x[i+d] -> i (shift must be >= 0)
        down = pltpu.roll(x64, d, 1)
        lead = (lanes & d) == 0
        partner = jnp.where(lead, up, down)
        x64 = jnp.where(lead, jnp.maximum(x64, partner),
                        jnp.minimum(x64, partner))
    return x64


def _memory_read_kernel(
    sim_ref,     # (TQ, TM) fp32 — shared similarity tile
    valid_ref,   # (1, 1, TM) fp32 — per-object slot validity
    mv_ref,      # (1, TM, Cv)
    out_ref,     # (1, TQ, Cv) fp32
    usage_ref,   # (1, 1, 1, 1, TM) fp32 — phase-indexed, only phase B summed
    run_ref,     # scratch (TQ, 32) fp32 — running top-32 (desc)
    th_ref,      # scratch (TQ, 1) fp32 — k-th threshold
    rm_ref,      # scratch (TQ, 1) fp32 — row max
    l_ref,       # scratch (TQ, 1) fp32 — softmax denominator
    acc_ref,     # scratch (TQ, Cv) fp32
    *,
    n_m: int,
    top_k: int,
    q_true: int,
):
    s = pl.program_id(2)
    qi = pl.program_id(1)
    j = s % n_m          # memory-tile index
    phase = s // n_m     # 0: threshold + denominator, 1: readout + usage

    valid = valid_ref[0, 0].astype(jnp.float32)[None, :]
    sim = jnp.where(valid > 0.5, sim_ref[:], NEG_INF)
    tq = sim.shape[0]

    @pl.when(phase == 0)
    def _threshold_phase():
        @pl.when(j == 0)
        def _():
            rm_ref[:] = jnp.full((tq, 1), NEG_INF, jnp.float32)
            run_ref[:] = jnp.full_like(run_ref, NEG_INF)

        rm_ref[:] = jnp.maximum(rm_ref[:], jnp.max(sim, axis=-1, keepdims=True))

        # k-step distinct-max extraction into an ASCENDING (TQ, 32) buffer:
        # the i-th extracted max lands at lane 31-i via a lane-select, so no
        # per-step column buffers are materialized (each would pad to 128
        # lanes and blow the VMEM stack).
        x = sim
        cand = jnp.full((tq, 32), NEG_INF, jnp.float32)
        lanes32 = jax.lax.broadcasted_iota(jnp.int32, (tq, 32), 1)
        for i in range(top_k):
            mx = jnp.max(x, axis=-1, keepdims=True)
            cand = jnp.where(lanes32 == 31 - i, mx, cand)
            x = jnp.where(x >= mx, NEG_INF, x)
        # [running desc top-32 | tile asc top-k] is bitonic -> merge
        merged = _bitonic_merge_desc(jnp.concatenate([run_ref[:], cand], axis=1))
        run_ref[:] = merged[:, :32]

        @pl.when(j == n_m - 1)
        def _():
            th_ref[:] = run_ref[:, top_k - 1: top_k]
            # denominator straight from the top-k values: the admitted set IS
            # the top-k (modulo documented tie collapse), so
            # l = Σ_{i<k} exp(run_i − rm). NEG_INF-padded lanes (rows with
            # fewer than k valid slots) contribute exp(−inf)=0; the all-
            # invalid row degenerates to l=k with a zero numerator -> out 0.
            top_lanes = jax.lax.broadcasted_iota(
                jnp.int32, (tq, 32), 1) < top_k
            ex = jnp.where(top_lanes, jnp.exp(run_ref[:] - rm_ref[:]), 0.0)
            l_ref[:] = jnp.sum(ex, axis=-1, keepdims=True)

    @pl.when(phase == 1)
    def _readout_phase():
        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        admit = (sim >= th_ref[:]) & (valid > 0.5)
        e = jnp.where(admit, jnp.exp(sim - rm_ref[:]), 0.0)
        # padded query rows (q >= q_true) must not contribute to usage
        row = qi * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
        e = jnp.where(row < q_true, e, 0.0)
        linv = 1.0 / jnp.maximum(l_ref[:], 1e-30)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            e, mv_ref[0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # usage: normalized-affinity column sums (memory_util.py:62-63)
        usage_ref[0, 0, 0] = jnp.sum(e * linv, axis=0, keepdims=True)

        @pl.when(j == n_m - 1)
        def _():
            out_ref[0] = acc_ref[:] * linv

    # phase 0 must still define its usage blocks (zero contribution)
    @pl.when(phase == 0)
    def _():
        usage_ref[0, 0, 0] = jnp.zeros((1, sim.shape[1]), jnp.float32)


def _memory_read_shared_kernel(
    live_ref,    # SMEM (1,) int32 — scalar-prefetch: first all-dead slot
    sim_ref,     # (TQ, TM) fp32 — shared similarity tile
    valid_ref,   # (1, TM) fp32 — SHARED slot validity (all objects)
    mv_ref,      # (O, TM, Cv) — all object values for this memory tile
    out_ref,     # (O, TQ, Cv) fp32
    usage_ref,   # (1, 1, 1, TM) fp32 — phase-indexed, only phase B summed
    run_ref,     # scratch (TQ, 32) fp32 — running top-32 (desc)
    th_ref,      # scratch (TQ, 1) fp32
    rm_ref,      # scratch (TQ, 1) fp32
    l_ref,       # scratch (TQ, 1) fp32
    acc_ref,     # scratch (TQ, O*Cv) fp32
    *,
    n_m: int,
    m_tile: int,
    top_k: int,
    q_true: int,
):
    """Shared-validity variant of `_memory_read_kernel`: every object admits
    the same slot set, so the threshold phase, the row max/denominator, and
    the admitted-affinity `e` are computed ONCE per query tile instead of
    once per object; the per-object work collapses to O unrolled MXU dots
    against one shared `e`. Grid is (n_q, 2*n_m) — independent of O.

    Dynamic-occupancy skip: tiles whose first slot is >= live_ref[0] hold no
    valid entries (work slots are a count-prefix, the LT arena sits below
    nl < live_end — manager.match_memory), so both phases skip their compute
    for those tiles (their contribution is exactly zero: all-invalid slots
    are NEG_INF-masked). The static arena price is then paid only in grid
    steps, not in VPU/MXU work — the read cost tracks the true occupancy."""
    s = pl.program_id(1)
    qi = pl.program_id(0)
    j = s % n_m
    phase = s // n_m
    tile_live = j * m_tile < live_ref[0]

    tq = sim_ref.shape[0]
    n_obj, _, cv = mv_ref.shape

    @pl.when(phase == 0)
    def _threshold_phase():
        @pl.when(j == 0)
        def _():
            rm_ref[:] = jnp.full((tq, 1), NEG_INF, jnp.float32)
            run_ref[:] = jnp.full_like(run_ref, NEG_INF)

        @pl.when(tile_live)
        def _():
            valid = valid_ref[0].astype(jnp.float32)[None, :]
            sim = jnp.where(valid > 0.5, sim_ref[:], NEG_INF)
            rm_ref[:] = jnp.maximum(
                rm_ref[:], jnp.max(sim, axis=-1, keepdims=True))
            x = sim
            cand = jnp.full((tq, 32), NEG_INF, jnp.float32)
            lanes32 = jax.lax.broadcasted_iota(jnp.int32, (tq, 32), 1)
            for i in range(top_k):
                mx = jnp.max(x, axis=-1, keepdims=True)
                cand = jnp.where(lanes32 == 31 - i, mx, cand)
                x = jnp.where(x >= mx, NEG_INF, x)
            merged = _bitonic_merge_desc(
                jnp.concatenate([run_ref[:], cand], axis=1))
            run_ref[:] = merged[:, :32]

        usage_ref[0, 0] = jnp.zeros((1, m_tile), jnp.float32)

        @pl.when(j == n_m - 1)
        def _():
            th_ref[:] = run_ref[:, top_k - 1: top_k]
            top_lanes = jax.lax.broadcasted_iota(
                jnp.int32, (tq, 32), 1) < top_k
            ex = jnp.where(top_lanes, jnp.exp(run_ref[:] - rm_ref[:]), 0.0)
            l_ref[:] = jnp.sum(ex, axis=-1, keepdims=True)

    @pl.when(phase == 1)
    def _readout_phase():
        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(tile_live)
        def _():
            valid = valid_ref[0].astype(jnp.float32)[None, :]
            sim = jnp.where(valid > 0.5, sim_ref[:], NEG_INF)
            admit = (sim >= th_ref[:]) & (valid > 0.5)
            e = jnp.where(admit, jnp.exp(sim - rm_ref[:]), 0.0)
            row = qi * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
            e = jnp.where(row < q_true, e, 0.0)
            linv = 1.0 / jnp.maximum(l_ref[:], 1e-30)
            for oi in range(n_obj):
                acc_ref[:, oi * cv:(oi + 1) * cv] += jnp.dot(
                    e, mv_ref[oi].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            # per-object usage is identical under shared validity; the caller
            # multiplies the single column-sum by O (memory_util.py:62-63)
            usage_ref[0, 0] = jnp.sum(e * linv, axis=0, keepdims=True)

        @pl.when(jnp.logical_not(tile_live))
        def _():
            usage_ref[0, 0] = jnp.zeros((1, m_tile), jnp.float32)

        @pl.when(j == n_m - 1)
        def _():
            linv = 1.0 / jnp.maximum(l_ref[:], 1e-30)
            for oi in range(n_obj):
                out_ref[oi] = acc_ref[:, oi * cv:(oi + 1) * cv] * linv


def fused_memory_read_shared(
    mk: jax.Array,              # (M, Ck)
    ms: Optional[jax.Array],    # (M,) shrinkage or None
    qk: jax.Array,              # (Q, Ck)
    qe: Optional[jax.Array],    # (Q, Ck) selection or None
    mv: jax.Array,              # (O, M, Cv) — ALL rows live, identical validity
    valid: jax.Array,           # (M,) bool — shared slot validity
    top_k: int,
    return_usage: bool = False,
    live_end: Optional[jax.Array] = None,  # () int32 — all valid slots < this
    q_tile: int = 416,
    m_tile: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Shared-validity fused read: bit-equal to `fused_memory_read` with
    `valid` broadcast over objects, at ~1/O of the threshold/exp cost (the
    dominant phase at DAVIS sizes). Use when every object row of `mv` is
    live and admits the same slots — the MemoryConfig.live_objects contract
    (memory/manager.py): objects registered before any memory commit, so
    adds/consolidation keep validity rows identical (manager.py:161,224).

    `live_end` (traced scalar) promises `valid[i] == False` for all
    i >= live_end; memory tiles past it are skipped (compute AND tile
    copies — their blocks alias the last live tile), so the read costs
    what the arena actually HOLDS, not its static capacity. None = scan
    everything. Results are bit-identical either way.

    Returns ((O, Q, Cv) fp32 readout, (M,) usage summed over objects)."""
    o, m, cv = mv.shape
    q, ck = qk.shape
    if min(top_k, m) > 32:
        raise ValueError(
            f"fused_memory_read_shared supports top_k <= 32; got {top_k}"
        )
    mp = -(-m // m_tile) * m_tile
    tq = min(q_tile, -(-q // 8) * 8)

    # Scoped-VMEM guard. Mosaic's stack demand (measured ~1.3x this
    # estimate at O=3/Cv=512/TQ=416 -> 17.2M vs the 16M limit) is the
    # double-buffered out/sim/mv blocks plus the acc scratch; budget the
    # estimate to 10 MB so the real demand clears the limit with margin.
    def _vmem_est(t: int) -> int:
        per_tq = (2 * o * cv * 4      # out block x2 buffers
                  + o * cv * 4        # acc scratch
                  + 2 * m_tile * 4    # sim block x2
                  + (32 + 3 * 128) * 4)  # run/th/rm/l (lane-padded)
        return t * per_tq + 2 * o * m_tile * cv * 2 + (1 << 19)

    while tq > 64 and _vmem_est(tq) > 10 * 2 ** 20:
        tq -= 8
    qp = -(-q // tq) * tq
    n_m = mp // m_tile
    n_q = qp // tq
    k = min(top_k, m)

    sim = get_similarity(mk, ms, qk, qe)        # (Q, M) fp32
    sim_p = jnp.pad(sim, ((0, qp - q), (0, mp - m)), constant_values=NEG_INF)
    valid_p = jnp.pad(valid.astype(jnp.float32), (0, mp - m))[None, :]
    mv_p = jnp.pad(mv, ((0, 0), (0, mp - m), (0, 0)))
    live_arr = jnp.asarray(
        m if live_end is None else live_end, jnp.int32).reshape(1)

    def _last_live(live) -> jax.Array:
        # index of the last tile holding any slot < live_end (>= 0)
        return jnp.maximum((live[0] + m_tile - 1) // m_tile - 1, 0)

    def _j_eff(s, live) -> jax.Array:
        # dead tiles alias the last live tile: consecutive equal block
        # indices elide the HBM->VMEM copy entirely
        return jnp.minimum(s % n_m, _last_live(live))

    kernel = functools.partial(
        _memory_read_shared_kernel, n_m=n_m, m_tile=m_tile, top_k=k, q_true=q
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_q, 2 * n_m),
        in_specs=[
            pl.BlockSpec((tq, m_tile), lambda qi, s, live: (qi, _j_eff(s, live))),
            pl.BlockSpec((1, m_tile), lambda qi, s, live: (0, _j_eff(s, live))),
            # pin the mv tile to block 0 during phase A (consecutive equal
            # indices elide the copy) — phase A never reads it
            pl.BlockSpec(
                (o, m_tile, cv),
                lambda qi, s, live, _n=n_m: (
                    0, (s // _n) * _j_eff(s, live), 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((o, tq, cv), lambda qi, s, live: (0, qi, 0)),
            pl.BlockSpec(
                (1, 1, 1, m_tile),
                lambda qi, s, live, _n=n_m: (qi, s // _n, 0, s % _n),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 32), jnp.float32),       # running top-32
            pltpu.VMEM((tq, 1), jnp.float32),        # th
            pltpu.VMEM((tq, 1), jnp.float32),        # rm
            pltpu.VMEM((tq, 1), jnp.float32),        # l
            pltpu.VMEM((tq, o * cv), jnp.float32),   # acc
        ],
    )
    out, usage3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((o, qp, cv), jnp.float32),
            jax.ShapeDtypeStruct((n_q, 2, 1, mp), jnp.float32),
        ],
        interpret=interpret,
    )(live_arr, sim_p, valid_p, mv_p)

    out = out[:, :q]
    if not return_usage:
        return out, None
    usage = jnp.sum(usage3[:, 1, 0, :m], axis=0) * float(o)
    return out, usage


def fused_memory_read(
    mk: jax.Array,              # (M, Ck)
    ms: Optional[jax.Array],    # (M,) shrinkage or None
    qk: jax.Array,              # (Q, Ck)
    qe: Optional[jax.Array],    # (Q, Ck) selection or None
    mv: jax.Array,              # (O, M, Cv)
    valid: jax.Array,           # (O, M) bool — key & value validity combined
    top_k: int,
    return_usage: bool = False,
    # sized so sim workspace, acc/out (tq, Cv) fp32, and double-buffered
    # bf16/fp32 mv tiles fit the 16 MB VMEM scope
    q_tile: int = 416,
    m_tile: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Returns ((O, Q, Cv) fp32 readout, (M,) fp32 usage or None)."""
    o, m, cv = mv.shape
    q, ck = qk.shape
    if min(top_k, m) > 32:
        raise ValueError(
            f"fused_memory_read supports top_k <= 32 (running top-32 "
            f"candidate buffer); got {top_k}"
        )
    mp = -(-m // m_tile) * m_tile
    tq = min(q_tile, -(-q // 8) * 8)
    qp = -(-q // tq) * tq
    n_m = mp // m_tile
    n_q = qp // tq
    k = min(top_k, m)

    # Shared similarity, one big MXU matmul in fp32 (memory_util.py:7-39);
    # identical code to the XLA fallback so the two paths agree bitwise.
    sim = get_similarity(mk, ms, qk, qe)        # (Q, M) fp32
    sim_p = jnp.pad(sim, ((0, qp - q), (0, mp - m)), constant_values=NEG_INF)
    valid_p = jnp.pad(valid.astype(jnp.float32), ((0, 0), (0, mp - m)))[:, None, :]
    mv_p = jnp.pad(mv, ((0, 0), (0, mp - m), (0, 0)))

    kernel = functools.partial(
        _memory_read_kernel, n_m=n_m, top_k=k, q_true=q
    )
    out, usage3 = pl.pallas_call(
        kernel,
        grid=(o, n_q, 2 * n_m),
        in_specs=[
            pl.BlockSpec((tq, m_tile), lambda i, qi, s, _n=n_m: (qi, s % _n)),
            pl.BlockSpec((1, 1, m_tile), lambda i, qi, s, _n=n_m: (i, 0, s % _n)),
            pl.BlockSpec((1, m_tile, cv), lambda i, qi, s, _n=n_m: (i, s % _n, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, cv), lambda i, qi, s: (i, qi, 0)),
            pl.BlockSpec(
                (1, 1, 1, 1, m_tile),
                lambda i, qi, s, _n=n_m: (i, qi, s // _n, 0, s % _n),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, qp, cv), jnp.float32),
            jax.ShapeDtypeStruct((o, n_q, 2, 1, mp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 32), jnp.float32),       # running top-32
            pltpu.VMEM((tq, 1), jnp.float32),        # th
            pltpu.VMEM((tq, 1), jnp.float32),        # rm
            pltpu.VMEM((tq, 1), jnp.float32),        # l
            pltpu.VMEM((tq, cv), jnp.float32),       # acc
        ],
        interpret=interpret,
    )(sim_p, valid_p, mv_p)

    out = out[:, :q]
    if not return_usage:
        return out, None
    usage = jnp.sum(usage3[:, :, 1, 0, :m], axis=(0, 1))
    return out, usage
