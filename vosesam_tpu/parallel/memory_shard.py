"""Memory-axis-sharded read for extreme sequences (SURVEY §2.14 stretch).

The XMem memory hierarchy bounds per-frame read cost algorithmically
(consolidation, SURVEY §5), so a single chip handles 1–3k-frame videos. For
memories beyond one chip's HBM — or to cut read latency on very long
rollouts — this module shards the MEMORY axis across a mesh axis, a
context-parallel analogue over memory tokens:

  1. each device computes similarity against its LOCAL memory shard
     (ops.memory_attention.get_similarity — Q is replicated, M is sharded);
  2. local exact top-k candidate VALUES (k per query, small) are
     all-gathered over ICI and reduced to the exact global k-th threshold —
     the same union-of-candidates argument as hierarchical_top_k, so the
     result is EXACT, not approximate;
  3. each device computes its local masked-exp numerator acc_i = Σ e·mv and
     denominator l_i; a psum over the axis yields the exact softmax readout
     (softmax is a sum of per-shard sums once the max/threshold are global);
  4. usage stays local to the shard that owns each slot (no communication).

Communication per read: all_gather of (Q, k) fp32 + psum of (O, Q, Cv+1) —
independent of M. Wrap in shard_map over the chosen mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.ops.memory_attention import (
    NEG_INF,
    get_similarity,
    hierarchical_top_k,
)


def sharded_memory_read_local(
    mk: jax.Array,          # (M_local, Ck) this shard's keys
    ms: Optional[jax.Array],
    qk: jax.Array,          # (Q, Ck) replicated queries
    qe: Optional[jax.Array],
    mv: jax.Array,          # (O, M_local, Cv)
    valid: jax.Array,       # (O, M_local)
    top_k: int,
    axis_name: str,
) -> Tuple[jax.Array, jax.Array]:
    """Body to run under shard_map with `mk/ms/mv/valid` sharded on
    `axis_name` and `qk/qe` replicated. Returns ((O, Q, Cv) readout —
    identical on every device — and this shard's (M_local,) usage)."""
    sim = get_similarity(mk, ms, qk, qe)           # (Q, M_local) fp32

    def per_object(vvalid, values):
        s = jnp.where(vvalid[None, :], sim, NEG_INF)
        # local candidates -> exact global threshold over the gathered union
        local_top = hierarchical_top_k(s, min(top_k, s.shape[-1]))  # (Q, k)
        cand = jax.lax.all_gather(local_top, axis_name, axis=1)     # (Q, n, k)
        cand = cand.reshape(s.shape[0], -1)
        k = min(top_k, cand.shape[-1])
        topv = jax.lax.top_k(cand, k)[0]
        kth = topv[:, -1:]
        maxv = topv[:, :1]

        e = jnp.where((s >= kth) & vvalid[None, :], jnp.exp(s - maxv), 0.0)
        num = jnp.dot(e, values.astype(jnp.float32),
                      preferred_element_type=jnp.float32)           # (Q, Cv)
        den = jnp.sum(e, axis=-1, keepdims=True)                    # (Q, 1)
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
        out = num / jnp.clip(den, 1e-30)
        usage = jnp.sum(e / jnp.clip(den, 1e-30), axis=0)           # local M
        return out, usage

    outs, usages = jax.vmap(per_object)(valid, mv)
    return outs, jnp.sum(usages, axis=0)


def make_sharded_read(mesh, axis_name: str, top_k: int):
    """Build a jitted sharded read: memory sharded over `axis_name`,
    queries replicated, readout replicated."""
    from jax.sharding import PartitionSpec as P

    from vosesam_tpu.parallel.compat import shard_map

    fn = partial(sharded_memory_read_local, top_k=top_k, axis_name=axis_name)

    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),        # mk
            P(axis_name),              # ms
            P(None, None),             # qk (replicated)
            P(None, None),             # qe
            P(None, axis_name, None),  # mv
            P(None, axis_name),        # valid
        ),
        out_specs=(P(None, None, None), P(axis_name)),
        check_rep=False,
    )
    return jax.jit(sharded)
