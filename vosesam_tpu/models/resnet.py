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

def _s2d_stem_weight(w: jax.Array) -> jax.Array:
    """(7,7,C,64) stride-2 kernel -> (4,4,4C,64) stride-1 kernel over a
    2x-space-to-depth input. Exact: output pixel (i,j) of the stride-2 7x7
    conv reads input rows 2i-3..2i+3; in s2d coordinates (a, dy) with
    row = 2a+dy, that is kernel tap i = 2*ka + dy - 1 (one zero slot at
    i = -1), identically for columns."""
    c, o = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))        # i+1 = 2*ka+dy
    wp = wp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return wp.reshape(4, 4, 4 * c, o)


def _stem(x: jax.Array, params: Params) -> jax.Array:
    """conv1 (7x7 s2 p3) + bn + relu + 3x3 s2 maxpool.

    With even H, W (always true after pad_divide_by-16) the conv runs as a
    space-to-depth 4x4 stride-1 conv on 4C channels: the 7x7 kernel
    contracts only C_in=3..5 lanes, so the MXU runs nearly empty; s2d
    quadruples channel occupancy with bit-identical math (modulo fp
    reassociation, max|diff| 3.6e-7 fp32). Measured 3.51 -> 2.73 ms for the
    full rn50 trunk at 480p bf16 (scripts/exp_xmem_anatomy.py)."""
    n, h, w, c = x.shape
    if h % 2 == 0 and w % 2 == 0:
        x2 = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x2 = x2.reshape(n, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            x2, _s2d_stem_weight(params["conv1"]["weight"]).astype(x2.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        y = conv2d(x, params["conv1"], stride=2, padding=3)
    y = relu(batch_norm(y, params["bn1"]))
    return max_pool(y, 3, 2, 1)


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
    y = _stem(x, params)
    feats: List[jax.Array] = []
    for si in range(3):
        stage = params[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = 1 if (si == 0 or bi > 0) else 2
            y = block_fn(y, stage[str(bi)], stride)
        feats.append(y)
    f4, f8, f16 = feats
    return f4, f8, f16
