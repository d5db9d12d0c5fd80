"""Device mesh construction and sharding specs.

The reference is single-process single-GPU; its only distributed artifact is
a never-initialized DDP wrapper (tracker/model/trainer.py:27-29, SURVEY.md
§2.14). The TPU framework scales by design:

  - `data` axis: whole videos are sharded across devices for evaluation
    (memory state is per-sequence, so this is pure DP with no cross-talk —
    the BASELINE.json requirement);
  - `model` axis: optional tensor parallelism for the SAM ViT encoder
    (attention heads / MLP hidden sharded; XLA inserts the collectives).

Collectives ride ICI within a slice; `init_distributed()` (a thin
`jax.distributed.initialize` wrapper) extends the same mesh across hosts
(DCN): `jax.devices()` then spans all processes, `make_mesh` lays the same
named mesh over them, and `shard_batch` switches to global-array
construction. Exercised end-to-end by a real 2-process CPU cluster in
tests/test_multihost.py (scripts/multihost_worker.py)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vosesam_tpu.config import ParallelConfig


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize the JAX distributed runtime for multi-host execution.

    Call once per process BEFORE any computation; afterwards `jax.devices()`
    spans every host and `make_mesh()` builds one global mesh whose
    data-axis collectives ride DCN between hosts and ICI within a slice.
    On TPU pods all three arguments come from the environment (pass
    nothing); on CPU/GPU clusters pass them explicitly. The reference has
    no working analogue — its DDP wrapper is never initialized
    (tracker/model/trainer.py:27-29)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_mesh(cfg: ParallelConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, cfg: ParallelConfig) -> NamedSharding:
    """Leading axis = per-video batch, sharded over the data axis."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, cfg: ParallelConfig):
    """Place a leading-batch pytree with the batch axis over `data`.

    Works on a multi-host mesh too: when the mesh spans processes (devices
    this process cannot address), the global array is assembled from the
    host copy via make_array_from_callback — every process holds the full
    batch on host (the eval drivers load whole datasets), and each
    contributes only its addressable shards."""
    multihost = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def place(x):
        sh = NamedSharding(mesh, P(cfg.data_axis, *([None] * (x.ndim - 1))))
        if multihost:
            xnp = np.asarray(x)
            return jax.make_array_from_callback(
                xnp.shape, sh, lambda idx: xnp[idx])
        return jax.device_put(x, sh)

    return jax.tree.map(place, tree)


def shard_sam_params_tp(sam_params, mesh: Mesh, cfg: ParallelConfig):
    """Tensor-parallel placement for the SAM ViT encoder over the `model`
    axis: qkv/MLP hidden dims sharded, everything else replicated.

    XLA inserts all-reduces after the row-parallel projections — the
    megatron-style sharding recipe, expressed purely as placements."""
    axis = cfg.model_axis

    def spec_for(path: str, x) -> NamedSharding:
        if x.ndim == 2:
            if path.endswith("qkv.weight") or path.endswith("lin1.weight"):
                return NamedSharding(mesh, P(None, axis))      # column parallel
            if path.endswith("proj.weight") or path.endswith("lin2.weight"):
                return NamedSharding(mesh, P(axis, None))      # row parallel
        if x.ndim == 1 and (path.endswith("qkv.bias") or path.endswith("lin1.bias")):
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else k) for k, v in node.items()}
        return jax.device_put(node, spec_for(prefix, node))

    enc = walk(sam_params.image_encoder)
    rep = lambda t: jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), t)
    return sam_params._replace(
        image_encoder=enc,
        prompt_encoder=rep(sam_params.prompt_encoder),
        mask_decoder=rep(sam_params.mask_decoder),
    )
