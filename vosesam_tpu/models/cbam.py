"""Convolutional Block Attention Module (CBAM).

Reference: tracker/model/cbam.py — channel gate (shared 2-layer MLP over
global avg- and max-pooled descriptors, summed, sigmoid, :21-48) followed by a
spatial gate (channel max+mean stack -> 7x7 conv -> sigmoid, :54-64).

Functional NHWC version; the object axis rides the batch axis. Param-tree
names mirror the torch state_dict (``ChannelGate.mlp.1``, ``mlp.3``,
``SpatialGate.spatial.conv``) so checkpoint conversion is a key map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vosesam_tpu.models.layers import (
    Params,
    avg_pool_global,
    conv2d,
    conv_init,
    linear,
    linear_init,
    max_pool_global,
    relu,
)


def cbam_init(key, channels: int, reduction: int = 16, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ChannelGate": {
            "mlp": {
                "1": linear_init(k1, channels, channels // reduction, dtype=dtype),
                "3": linear_init(k2, channels // reduction, channels, dtype=dtype),
            }
        },
        "SpatialGate": {
            "spatial": {"conv": conv_init(k3, 7, 7, 2, 1, bias=True, dtype=dtype)}
        },
    }


def cbam(x: jax.Array, p: Params) -> jax.Array:
    """x: (..., H, W, C) -> gated features of the same shape."""
    # XLA:TPU miscompile workaround (NaNs at 480p; CPU and standalone-jit are
    # fine; triggered when two CBAM instances appear in one step graph, e.g.
    # the decoder and value fusers both consuming f16). Probing on the chip
    # localized the NaN to the degenerate 7x7 2->1-channel SpatialGate conv
    # when fused into the surrounding graph; a barrier keeps the producer out
    # of the bad fusion and the conv is run with channels padded to the 8-
    # sublane tile (mathematically identical — pad channels are zero).
    # Verified on TPU v5e (axon), JAX 0.9.0 — re-evaluate on toolchain
    # upgrades.
    x = jax.lax.optimization_barrier(x)
    mlp = p["ChannelGate"]["mlp"]

    def gate_mlp(pooled):  # (..., 1, 1, C)
        v = pooled[..., 0, 0, :]
        return linear(relu(linear(v, mlp["1"])), mlp["3"])

    att = gate_mlp(avg_pool_global(x)) + gate_mlp(max_pool_global(x))
    x = x * jax.nn.sigmoid(att)[..., None, None, :]

    compress = jnp.concatenate(
        [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)],
        axis=-1,
    )
    compress = jax.lax.optimization_barrier(compress)
    compress = jnp.pad(compress, [(0, 0)] * (compress.ndim - 1) + [(0, 6)])
    sp = dict(p["SpatialGate"]["spatial"]["conv"])
    sp["weight"] = jnp.pad(sp["weight"], [(0, 0), (0, 0), (0, 6), (0, 0)])
    spatial = conv2d(compress, sp, padding=3)
    return x * jax.nn.sigmoid(spatial)
