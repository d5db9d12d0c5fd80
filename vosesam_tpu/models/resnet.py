"""Functional ResNet trunks (feature extractors) for the XMem encoders.

Reference: tracker/model/resnet.py (torchvision-style ResNet with extra input
channels spliced into conv1, :14-32) and tracker/model/modules.py —
KeyEncoder uses resnet50 through layer3 (f16=1024/f8=512/f4=256 at strides
16/8/4, modules.py:153-175); ValueEncoder uses resnet18 with extra_dim=2
(mask + other-objects channels, modules.py:102-122).

Only the trunk through layer3 is built (layer4/fc are unused by XMem).
Param-tree leaf names mirror the torch state_dict, activations are NHWC.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.models.layers import (
    Params,
    batch_norm,
    bn_init,
    conv2d,
    conv_init,
    max_pool,
    relu,
)

# (block type, layers-per-stage, stage widths, expansion)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2), (64, 128, 256), 1),
    "resnet50": ("bottleneck", (3, 4, 6), (64, 128, 256), 4),
}


# ----------------------------------------------------------------------- init

def _basic_block_init(key, cin, cout, stride, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p: Params = {
        "conv1": conv_init(ks[0], 3, 3, cin, cout, bias=False, dtype=dtype),
        "bn1": bn_init(cout, dtype),
        "conv2": conv_init(ks[1], 3, 3, cout, cout, bias=False, dtype=dtype),
        "bn2": bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "0": conv_init(ks[2], 1, 1, cin, cout, bias=False, dtype=dtype),
            "1": bn_init(cout, dtype),
        }
    return p


def _bottleneck_init(key, cin, cmid, stride, dtype) -> Params:
    cout = cmid * 4
    ks = jax.random.split(key, 4)
    p: Params = {
        "conv1": conv_init(ks[0], 1, 1, cin, cmid, bias=False, dtype=dtype),
        "bn1": bn_init(cmid, dtype),
        "conv2": conv_init(ks[1], 3, 3, cmid, cmid, bias=False, dtype=dtype),
        "bn2": bn_init(cmid, dtype),
        "conv3": conv_init(ks[2], 1, 1, cmid, cout, bias=False, dtype=dtype),
        "bn3": bn_init(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {
            "0": conv_init(ks[3], 1, 1, cin, cout, bias=False, dtype=dtype),
            "1": bn_init(cout, dtype),
        }
    return p


def resnet_init(key, arch: str, extra_dim: int = 0, dtype=jnp.float32) -> Params:
    """Random init with torch-compatible tree structure.

    `extra_dim` widens conv1's input (reference resnet.py:14-32 pads the
    pretrained kernel with orthogonal-init channels; random init here — real
    runs load converted checkpoints)."""
    block, stages, widths, exp = RESNET_SPECS[arch]
    keys = jax.random.split(key, 2 + sum(stages))
    p: Params = {
        "conv1": conv_init(keys[0], 7, 7, 3 + extra_dim, 64, bias=False, dtype=dtype),
        "bn1": bn_init(64, dtype),
    }
    ki = 1
    cin = 64
    for si, (n, w) in enumerate(zip(stages, widths)):
        stage: Params = {}
        for bi in range(n):
            stride = 1 if (si == 0 or bi > 0) else 2
            if block == "basic":
                stage[str(bi)] = _basic_block_init(keys[ki], cin, w, stride, dtype)
                cin = w
            else:
                stage[str(bi)] = _bottleneck_init(keys[ki], cin, w, stride, dtype)
                cin = w * 4
            ki += 1
        p[f"layer{si + 1}"] = stage
    return p


# -------------------------------------------------------------------- forward

def _basic_block(x, p: Params, stride: int) -> jax.Array:
    idn = x
    y = relu(batch_norm(conv2d(x, p["conv1"], stride=stride, padding=1), p["bn1"]))
    y = batch_norm(conv2d(y, p["conv2"], stride=1, padding=1), p["bn2"])
    if "downsample" in p:
        idn = batch_norm(conv2d(x, p["downsample"]["0"], stride=stride), p["downsample"]["1"])
    return relu(y + idn)


def _bottleneck(x, p: Params, stride: int) -> jax.Array:
    idn = x
    y = relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    y = relu(batch_norm(conv2d(y, p["conv2"], stride=stride, padding=1), p["bn2"]))
    y = batch_norm(conv2d(y, p["conv3"]), p["bn3"])
    if "downsample" in p:
        idn = batch_norm(conv2d(x, p["downsample"]["0"], stride=stride), p["downsample"]["1"])
    return relu(y + idn)


def resnet_features(x: jax.Array, params: Params, arch: str) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NHWC input -> (f4, f8, f16) multi-scale features.

    f4 after layer1 (stride 4), f8 after layer2 (stride 8), f16 after layer3
    (stride 16) — the taps KeyEncoder exposes (modules.py:166-175)."""
    block_fn = _basic_block if RESNET_SPECS[arch][0] == "basic" else _bottleneck
    y = relu(batch_norm(conv2d(x, params["conv1"], stride=2, padding=3), params["bn1"]))
    y = max_pool(y, 3, 2, 1)
    feats: List[jax.Array] = []
    for si in range(3):
        stage = params[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = 1 if (si == 0 or bi > 0) else 2
            y = block_fn(y, stage[str(bi)], stride)
        feats.append(y)
    f4, f8, f16 = feats
    return f4, f8, f16
