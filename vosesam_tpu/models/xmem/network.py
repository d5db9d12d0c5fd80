"""XMem top-level network, functional.

Reference: tracker/model/network.py (+ modules.py). Differences by design:
  - no batch axis: one video per device (evaluation is sequence-data-parallel
    over the mesh, see parallel/); image feats are (H, W, C), group feats are
    (O, H, W, C) with a static padded object axis and an (O,) validity mask;
  - `encode_value` takes the validity mask so padded objects produce zeroed
    values and do not pollute the "others" channel (network.py:72-87);
  - `segment` returns the aggregated distribution including background
    (aggregate handled by ops.aggregate.soft_aggregate with validity).

Checkpoint hyperparameters (key/value/hidden dims) are inferred from weight
shapes exactly like network.py:134-182 — see utils/checkpoint.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import XMemConfig
from vosesam_tpu.models import resnet
from vosesam_tpu.models.layers import Params, conv2d, conv_init, interpolate_bilinear, relu
from vosesam_tpu.models.xmem import modules as M
from vosesam_tpu.ops.aggregate import soft_aggregate


class MultiScaleFeatures(NamedTuple):
    f16: jax.Array  # (H/16, W/16, 1024)
    f8: jax.Array   # (H/8,  W/8,  512)
    f4: jax.Array   # (H/4,  W/4,  256)


# ----------------------------------------------------------------------- init

def xmem_init(key, cfg: XMemConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    extra = 1 if cfg.single_object else 2
    params: Params = {
        "key_encoder": resnet.resnet_init(ks[0], "resnet50", dtype=dtype),
        "key_proj": M.key_projection_init(ks[1], 1024, cfg.key_dim, dtype),
        "value_encoder": {
            **resnet.resnet_init(ks[2], "resnet18", extra_dim=extra, dtype=dtype),
            "fuser": M.feature_fusion_init(ks[3], 1024, 256, cfg.value_dim, cfg.value_dim, dtype),
        },
        "decoder": {
            "fuser": M.feature_fusion_init(
                ks[4], 1024, cfg.value_dim + cfg.hidden_dim, 512, 512, dtype
            ),
            "up_16_8": M.upsample_block_init(ks[5], 512, 512, 256, dtype),
            "up_8_4": M.upsample_block_init(ks[6], 256, 256, 256, dtype),
            "pred": conv_init(jax.random.split(ks[7])[0], 3, 3, 256, 1, dtype=dtype),
        },
    }
    if cfg.use_hidden:
        k_hu, k_hr = jax.random.split(jax.random.fold_in(key, 99))
        params["decoder"]["hidden_update"] = M.hidden_updater_init(
            k_hu, (512, 256, 256 + 1), 256, cfg.hidden_dim, dtype
        )
        params["value_encoder"]["hidden_reinforce"] = M.hidden_reinforcer_init(
            k_hr, cfg.value_dim, cfg.hidden_dim, dtype
        )
    return params


# ------------------------------------------------------------------- encoders

def encode_key(
    params: Params,
    frame: jax.Array,  # (H, W, 3) normalized
    need_sk: bool = True,
    need_ek: bool = True,
):
    """network.py:40-70 for the single-frame (4-D) path.

    Returns (key, shrinkage, selection, MultiScaleFeatures); key is
    (H/16, W/16, C_k)."""
    f4, f8, f16 = resnet.resnet_features(frame[None], params["key_encoder"], "resnet50")
    key, shrinkage, selection = M.key_projection(f16, params["key_proj"], need_sk, need_ek)
    squeeze = lambda a: None if a is None else a[0]
    return (
        squeeze(key),
        squeeze(shrinkage),
        squeeze(selection),
        MultiScaleFeatures(f16[0], f8[0], f4[0]),
    )


def compute_others(masks: jax.Array, valid: jax.Array) -> jax.Array:
    """Per-object sum of all *other* valid objects' masks (network.py:74-84)."""
    v = valid.astype(masks.dtype)[:, None, None]
    total = jnp.sum(masks * v, axis=0, keepdims=True)
    return (total - masks * v) * v  # padded objects see zeros


def encode_value(
    params: Params,
    frame: jax.Array,        # (H, W, 3) normalized
    f16: jax.Array,          # (H/16, W/16, 1024) from encode_key
    hidden: Optional[jax.Array],  # (O, H/16, W/16, C_h) or None
    masks: jax.Array,        # (O, H, W) fg probability per object
    valid: jax.Array,        # (O,) bool
    cfg: XMemConfig,
    is_deep_update: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """network.py:72-87 + modules.py ValueEncoder: returns ((O, H/16, W/16,
    C_v) value, updated hidden)."""
    vp = params["value_encoder"]
    masks = masks.astype(frame.dtype)
    others = compute_others(masks, valid)
    if cfg.single_object:
        g = masks[..., None]
    else:
        g = jnp.stack([masks, others], axis=-1)          # (O, H, W, 2)
    g = M.distribute(frame, g)                           # (O, H, W, 3+extra)

    _, _, g16 = resnet.resnet_features(g, vp, "resnet18")  # (O, H/16, W/16, 256)
    g16 = M.feature_fusion(f16, g16, vp["fuser"])          # (O, ..., C_v)

    if is_deep_update and cfg.use_hidden and hidden is not None:
        hidden = M.hidden_reinforcer(g16, hidden, vp["hidden_reinforce"], cfg.hidden_dim)
    # Zero out padded objects so ring-buffer writes stay clean.
    vmask = valid.astype(g16.dtype)[:, None, None, None]
    g16 = g16 * vmask
    return g16, hidden


# -------------------------------------------------------------------- decoder

def segment(
    params: Params,
    feats: MultiScaleFeatures,
    memory_readout: jax.Array,   # (O, H/16, W/16, C_v)
    hidden: Optional[jax.Array],  # (O, H/16, W/16, C_h)
    valid: jax.Array,            # (O,) bool
    cfg: XMemConfig,
    h_out: bool = True,
    strip_bg: bool = True,
) -> Tuple[Optional[jax.Array], jax.Array, jax.Array]:
    """Decoder + soft aggregation (network.py:107-120, modules.py:214-250).

    Returns (new_hidden, logits (1+O, H, W), prob ((O or 1+O), H, W))."""
    dp = params["decoder"]
    if cfg.use_hidden and hidden is not None:
        g16 = M.feature_fusion(
            feats.f16, jnp.concatenate([memory_readout, hidden], -1), dp["fuser"]
        )
    else:
        g16 = M.feature_fusion(feats.f16, memory_readout, dp["fuser"])

    g8 = M.upsample_block(feats.f8, g16, dp["up_16_8"])
    g4 = M.upsample_block(feats.f4, g8, dp["up_8_4"])
    logits_lr = conv2d(relu(g4), dp["pred"], padding=1)   # (O, H/4, W/4, 1)

    new_hidden = None
    if h_out and cfg.use_hidden and hidden is not None:
        g4_cat = jnp.concatenate([g4, logits_lr], -1)
        new_hidden = M.hidden_updater(
            g16, g8, g4_cat, hidden, dp["hidden_update"], cfg.hidden_dim
        )

    logits = interpolate_bilinear(logits_lr, 4.0)[..., 0].astype(jnp.float32)
    prob = jax.nn.sigmoid(logits)
    agg, agg_logits = soft_aggregate(prob, valid, dim=0, return_logits=True)
    if strip_bg:
        prob_out = agg[1:]
    else:
        prob_out = agg
    return new_hidden, agg_logits, prob_out
