"""XMem memory-read attention: anisotropic L2 similarity + top-k softmax + readout.

Reference math: tracker/model/memory_util.py:7-80 —
  similarity(q, m) = ms_m * ( -Σ_c e_qc k_mc² + 2 Σ_c e_qc q_qc k_mc
                              - Σ_c e_qc q_qc² ) / sqrt(C_k)
where ``ms`` is the memory-key shrinkage term and ``e`` the query selection
gate; then a top-k (k=30) sparse softmax over the memory axis
(memory_util.py:41-65) and a value readout matmul (memory_util.py:73-80).

TPU-first design decisions vs the reference:
  - layouts are (tokens, channels) so similarity is two MXU matmuls;
  - the top-k sparse softmax is realized *without* scatter: the k-th largest
    similarity per query is used as a threshold and the affinity is a dense
    masked exp-normalize — identical result up to ties, and MXU/VPU friendly;
  - invalid ring-buffer slots (static-capacity memory, see memory/rings.py)
    are masked to -inf before the top-k so padding never wins;
  - the multi-object "group" temporal extents (memory_manager.py:87-99) are
    expressed as a per-(object, slot) validity mask and vmapped, replacing the
    reference's per-group Python loop;
  - fp32 accumulation for the similarity and softmax even when keys/values
    are bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def get_similarity(
    mk: jax.Array,   # (M, C_k) memory keys
    ms: Optional[jax.Array],  # (M,) shrinkage (>=1) or None
    qk: jax.Array,   # (Q, C_k) query keys
    qe: Optional[jax.Array],  # (Q, C_k) query selection in [0,1] or None
) -> jax.Array:
    """Returns (Q, M) similarity in fp32. Mirrors memory_util.py:7-39."""
    ck = mk.shape[-1]
    mk32 = mk.astype(jnp.float32)
    qk32 = qk.astype(jnp.float32)
    if qe is not None:
        qe32 = qe.astype(jnp.float32)
        # a_sq[q,m] = Σ_c e_qc k_mc²; ab[q,m] = Σ_c e_qc q_qc k_mc
        a_sq = jnp.dot(qe32, (mk32 * mk32).T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
        ab = jnp.dot(qe32 * qk32, mk32.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGH)
        b_sq = jnp.sum(qe32 * qk32 * qk32, axis=-1, keepdims=True)
        sim = -a_sq + 2.0 * ab - b_sq
    else:
        a_sq = jnp.sum(mk32 * mk32, axis=-1)[None, :]
        ab = jnp.dot(qk32, mk32.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGH)
        sim = -a_sq + 2.0 * ab  # -b_sq is constant per query; dropped as in ref
    if ms is not None:
        sim = sim * ms.astype(jnp.float32)[None, :]
    return sim / jnp.sqrt(jnp.float32(ck))


def hierarchical_top_k(sim: jax.Array, k: int, chunk: int = 512) -> jax.Array:
    """EXACT top-k values over the last axis, computed hierarchically.

    ``lax.top_k`` over the full memory axis (M ≈ 17k at DAVIS-480p) lowers
    to a sort and dominates the frame step on TPU (~30 ms per object).
    Splitting M into chunks, taking each chunk's top-k, and reducing over
    the (n_chunks · k) candidates is exact — the global top-k is a subset of
    the per-chunk top-ks — and an order of magnitude faster (measured on
    v5e; see BASELINE.md).
    """
    m = sim.shape[-1]
    k = min(k, m)
    if m <= 2 * chunk:
        return jax.lax.top_k(sim, k)[0]
    pad = (-m) % chunk
    x = sim
    if pad:
        x = jnp.pad(x, [(0, 0)] * (sim.ndim - 1) + [(0, pad)],
                    constant_values=NEG_INF)
    x = x.reshape(*sim.shape[:-1], -1, chunk)
    cand = jax.lax.top_k(x, min(k, chunk))[0]
    cand = cand.reshape(*sim.shape[:-1], -1)
    return jax.lax.top_k(cand, k)[0]


def topk_softmax(
    sim: jax.Array,            # (Q, M) fp32
    valid: Optional[jax.Array],  # (M,) or (Q, M) bool
    top_k: int,
    return_usage: bool = False,
    approx: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Top-k sparse softmax over the memory axis (memory_util.py:41-65).

    Threshold formulation: affinity is nonzero only where sim >= kth-largest.
    The exact threshold comes from `hierarchical_top_k` (chunked exact
    top-k — MUCH cheaper than a full sort at memory sizes). With `approx`,
    it comes from `lax.approx_max_k` instead — the TPU-native bucketed
    top-k; a slightly-low threshold only ADMITS a few extra keys into the
    softmax (graceful, monotone degradation), kept as an opt-in speed knob.
    Returns (affinity (Q, M) fp32, usage (M,) or None).
    """
    v = None
    if valid is not None:
        v = valid if valid.ndim == 2 else valid[None, :]
        sim = jnp.where(v, sim, NEG_INF)
    m = sim.shape[-1]
    k = min(top_k, m)
    if approx and k < m:
        topv = jax.lax.approx_max_k(sim, k, recall_target=0.95)[0]
        # approx can miss the true max; exp(sim - maxv) then overflows to
        # inf and the normalized affinity goes NaN. Clamp with the true max.
        maxv = jnp.maximum(topv[:, :1], jnp.max(sim, axis=-1, keepdims=True))
    else:
        topv = hierarchical_top_k(sim, k)      # (Q, k) descending
        maxv = topv[:, :1]
    kth = topv[:, -1:]                          # (Q, 1)
    mask = sim >= kth
    if v is not None:
        # Guard the all-invalid case: every sim is NEG_INF, so `sim >= kth`
        # would be all-True and spread uniform affinity over invalid slots.
        mask = mask & v
    e = jnp.where(mask, jnp.exp(sim - maxv), 0.0)
    affinity = e / jnp.clip(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    usage = jnp.sum(affinity, axis=0) if return_usage else None
    return affinity, usage


def readout(affinity: jax.Array, mv: jax.Array) -> jax.Array:
    """(Q, M) fp32 affinity × (M, C_v) values -> (Q, C_v) (memory_util.py:73-80)."""
    return jnp.dot(
        affinity.astype(jnp.float32),
        mv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )


def read_memory_multiobject(
    mk: jax.Array,          # (M, C_k) shared memory keys
    ms: Optional[jax.Array],  # (M,)
    mv: jax.Array,          # (O, M, C_v) per-object values
    qk: jax.Array,          # (Q, C_k)
    qe: Optional[jax.Array],  # (Q, C_k)
    key_valid: jax.Array,   # (M,) bool — slot holds a real key
    value_valid: jax.Array,  # (O, M) bool — object has a value in that slot
    top_k: int,
    return_usage: bool = False,
    approx: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Per-object top-k read with shared similarity.

    The similarity matmuls are computed once; masking + top-k + softmax +
    readout run per object (different objects may have different temporal
    extents, kv_memory_store.py:10-16). Returns ((O, Q, C_v) readout,
    (M,) usage summed over objects or None).
    """
    sim = get_similarity(mk, ms, qk, qe)        # (Q, M)

    def per_object(vvalid, values):
        aff, use = topk_softmax(
            sim, key_valid & vvalid, top_k,
            return_usage=return_usage, approx=approx,
        )
        return readout(aff, values), use

    outs, usages = jax.vmap(per_object)(value_valid, mv)
    usage = None
    if return_usage:
        # A key slot's usage accumulates over every object that read it
        # (memory_manager.py:109-119 records usage once per matched group).
        usage = jnp.sum(usages, axis=0)
    return outs, usage
