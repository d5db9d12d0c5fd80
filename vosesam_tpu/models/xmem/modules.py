"""XMem building blocks, functional NHWC.

Reference: tracker/model/modules.py + group_modules.py. Conventions here:
  - image features are (H, W, C);
  - group (per-object) features are (O, H, W, C) with O a *static* padded
    object axis — the conv batch axis plays the reference's flattened
    B*num_objects role (group_modules.py:29-33);
  - GRUs use the reference's non-standard gate order (modules.py:65-67,
    intentional there, kept for checkpoint parity):
        new_h = forget*h*(1-update) + update*tanh(new_value)

Param-tree leaf names mirror the torch state_dict for mechanical checkpoint
conversion (utils/checkpoint.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.models.cbam import cbam, cbam_init
from vosesam_tpu.models.layers import (
    Params,
    conv2d,
    conv_init,
    interpolate_bilinear,
    relu,
)


# ------------------------------------------------------------- group helpers

def distribute(x: jax.Array, g: jax.Array, method: str = "cat") -> jax.Array:
    """Broadcast image features x (H, W, C) onto the object axis of g
    (O, H, W, Cg). MainToGroupDistributor (group_modules.py:58-80)."""
    xb = jnp.broadcast_to(x[None], (g.shape[0],) + x.shape)
    if method == "cat":
        return jnp.concatenate([xb, g], axis=-1)
    if method == "add":
        return xb + g
    raise NotImplementedError(method)


def upsample_groups(g: jax.Array, ratio: int = 2) -> jax.Array:
    return interpolate_bilinear(g, float(ratio))


def downsample_groups_area(g: jax.Array, factor: int) -> jax.Array:
    """'area' downsampling = average pooling with window=stride=factor
    (group_modules.py:25: F.interpolate mode='area')."""
    o, h, w, c = g.shape
    y = jax.lax.reduce_window(
        g, 0.0, jax.lax.add,
        (1, factor, factor, 1), (1, factor, factor, 1), "VALID",
    )
    return y / float(factor * factor)


# ------------------------------------------------------------------- blocks

def group_resblock_init(key, cin, cout, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    p: Params = {
        "conv1": conv_init(ks[0], 3, 3, cin, cout, dtype=dtype),
        "conv2": conv_init(ks[1], 3, 3, cout, cout, dtype=dtype),
    }
    if cin != cout:
        p["downsample"] = conv_init(ks[2], 3, 3, cin, cout, dtype=dtype)
    return p


def group_resblock(g: jax.Array, p: Params) -> jax.Array:
    """GroupResBlock (group_modules.py:36-54): pre-activation residual."""
    y = conv2d(relu(g), p["conv1"], padding=1)
    y = conv2d(relu(y), p["conv2"], padding=1)
    if "downsample" in p:
        g = conv2d(g, p["downsample"], padding=1)
    return y + g


def feature_fusion_init(key, x_in, g_in, g_mid, g_out, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "block1": group_resblock_init(ks[0], x_in + g_in, g_mid, dtype),
        "attention": cbam_init(ks[1], g_mid, dtype=dtype),
        "block2": group_resblock_init(ks[2], g_mid, g_out, dtype),
    }


def feature_fusion(x: jax.Array, g: jax.Array, p: Params) -> jax.Array:
    """FeatureFusionBlock (modules.py:22-41): distribute-cat, resblock, CBAM
    residual, resblock."""
    g = distribute(x, g)
    g = group_resblock(g, p["block1"])
    r = cbam(g, p["attention"])
    return group_resblock(g + r, p["block2"])


def gru_gate(values: jax.Array, h: jax.Array, hidden_dim: int) -> jax.Array:
    """The XMem non-standard GRU update shared by HiddenUpdater and
    HiddenReinforcer (modules.py:61-74 / :90-99)."""
    forget = jax.nn.sigmoid(values[..., :hidden_dim])
    update = jax.nn.sigmoid(values[..., hidden_dim:hidden_dim * 2])
    new_value = jnp.tanh(values[..., hidden_dim * 2:])
    return forget * h * (1 - update) + update * new_value


def hidden_updater_init(key, g_dims, mid_dim, hidden_dim, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "g16_conv": conv_init(ks[0], 1, 1, g_dims[0], mid_dim, dtype=dtype),
        "g8_conv": conv_init(ks[1], 1, 1, g_dims[1], mid_dim, dtype=dtype),
        "g4_conv": conv_init(ks[2], 1, 1, g_dims[2], mid_dim, dtype=dtype),
        "transform": conv_init(ks[3], 3, 3, mid_dim + hidden_dim, hidden_dim * 3, dtype=dtype),
    }


def hidden_updater(g16, g8, g4, h, p: Params, hidden_dim: int) -> jax.Array:
    """Decoder GRU over multi-scale group features (modules.py:44-74)."""
    g = (
        conv2d(g16, p["g16_conv"])
        + conv2d(downsample_groups_area(g8, 2), p["g8_conv"])
        + conv2d(downsample_groups_area(g4, 4), p["g4_conv"])
    )
    values = conv2d(jnp.concatenate([g, h], -1), p["transform"], padding=1)
    return gru_gate(values, h, hidden_dim)


def hidden_reinforcer_init(key, g_dim, hidden_dim, dtype=jnp.float32) -> Params:
    return {"transform": conv_init(key, 3, 3, g_dim + hidden_dim, hidden_dim * 3, dtype=dtype)}


def hidden_reinforcer(g, h, p: Params, hidden_dim: int) -> jax.Array:
    """Value-encoder GRU (modules.py:77-99)."""
    values = conv2d(jnp.concatenate([g, h], -1), p["transform"], padding=1)
    return gru_gate(values, h, hidden_dim)


def key_projection_init(key, in_dim, key_dim, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "key_proj": conv_init(ks[0], 3, 3, in_dim, key_dim, dtype=dtype),
        "d_proj": conv_init(ks[1], 3, 3, in_dim, 1, dtype=dtype),
        "e_proj": conv_init(ks[2], 3, 3, in_dim, key_dim, dtype=dtype),
    }


def key_projection(
    x: jax.Array, p: Params, need_s: bool = True, need_e: bool = True
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """KeyProjection (modules.py:194-211): key, shrinkage=d²+1, selection=σ(e)."""
    shrinkage = jnp.square(conv2d(x, p["d_proj"], padding=1)) + 1 if need_s else None
    selection = jax.nn.sigmoid(conv2d(x, p["e_proj"], padding=1)) if need_e else None
    return conv2d(x, p["key_proj"], padding=1), shrinkage, selection


def upsample_block_init(key, skip_dim, g_up_dim, g_out_dim, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "skip_conv": conv_init(k1, 3, 3, skip_dim, g_up_dim, dtype=dtype),
        "out_conv": group_resblock_init(k2, g_up_dim, g_out_dim, dtype),
    }


def upsample_block(skip_f: jax.Array, up_g: jax.Array, p: Params) -> jax.Array:
    """UpsampleBlock (modules.py:178-192): skip conv + 2x bilinear + add + GRB."""
    skip = conv2d(skip_f, p["skip_conv"], padding=1)
    g = upsample_groups(up_g, 2)
    return group_resblock(distribute(skip, g, "add"), p["out_conv"])
