"""Mesh-sharded inpaint windows: static windows data-parallel over devices.

The inpaint driver's windows are input-independent until host-side
compositing — every window reads only the shared padded video, and outputs
are blended 50/50 on the host (inpainter/base_inpainter.py:123-146) — so
they scale embarrassingly across chips. Crucially this is NOT the vmapped
window batch: on-chip batching measurably LOSES (BASELINE.md window-batch
ledger — the propagation scan's per-step convs/gathers pick memory-hostile
layouts at B>1), so each device runs the fastest-known B=1 program on its
own window. Params replicate; the only collective is the output
concatenation XLA inserts at the jit boundary.

Used by `pipeline.inpaint.Inpainter(mesh=...)`; equivalence vs the
sequential static path is tested on the virtual 8-device CPU mesh
(tests/test_parallel.py)."""

from __future__ import annotations

from typing import Tuple

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vosesam_tpu.config import InpainterConfig
from vosesam_tpu.models.e2fgvi import generator as G


def data_axis(mesh: Mesh) -> Tuple[str, int]:
    """(leading axis name, its size) — windows shard over this axis."""
    return mesh.axis_names[0], mesh.devices.shape[0]


def replicate_params(params, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)


def shard_windows(windows, valids, mesh: Mesh):
    """Place (B, T, H, W, 3) windows / (B, T) valids over the data axis."""
    da, _ = data_axis(mesh)
    sw = NamedSharding(mesh, P(da))
    return jax.device_put(windows, sw), jax.device_put(valids, sw)


def make_sharded_window_fn(cfg: InpainterConfig, mesh: Mesh, num_local: int):
    """Jitted fn(params, windows (B, T, H, W, 3), valids (B, T) bool)
    -> (B, T, H, W, 3), with B sharded over the mesh's leading (data) axis.

    B must be a multiple of the data-axis size; each device loops its k =
    B/dp local windows through the unbatched generator (k is usually 1 —
    the per-chip optimum). The model axis, if present, is unused here:
    params replicate across the whole mesh."""
    da, _ = data_axis(mesh)

    def device_body(params, frames, valids):
        return jax.lax.map(
            lambda args: G.generator_forward(
                params, args[0], num_local, cfg, frame_valid=args[1])[0],
            (frames, valids),
        )

    fn = shard_map(
        device_body,
        mesh=mesh,
        in_specs=(P(), P(da), P(da)),
        out_specs=P(da),
        check_vma=False,
    )
    return jax.jit(fn)
