"""Minimal functional NN layer library.

Design: parameters live in nested dicts whose leaf names mirror the PyTorch
state_dict entries of the reference models (``weight``, ``bias``,
``running_mean`` ...), with conv kernels pre-transposed to HWIO so the
torch->JAX checkpoint converter (utils/checkpoint.py) is a mechanical key map.
All activations are NHWC (TPU-preferred). Everything is a pure function; no
module objects, so the whole model jits and shards trivially.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


# ----------------------------------------------------------------- init utils

def _fan_in(shape: Sequence[int]) -> int:
    # HWIO conv kernel or (in, out) dense kernel
    if len(shape) == 4:
        return shape[0] * shape[1] * shape[2]
    return shape[0]


def kaiming_conv(key, kh, kw, cin, cout, dtype=jnp.float32) -> jax.Array:
    """He-normal fan-out init (torch's default for ResNet convs)."""
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (kh, kw, cin, cout), dtype)


def conv_init(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32) -> Params:
    kk, kb = jax.random.split(key)
    p = {"weight": kaiming_conv(kk, kh, kw, cin, cout, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(kh * kw * cin)
        p["bias"] = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return p


def linear_init(key, cin, cout, bias=True, dtype=jnp.float32) -> Params:
    kk, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    p = {"weight": jax.random.uniform(kk, (cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return p


def bn_init(c, dtype=jnp.float32) -> Params:
    return {
        "weight": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "running_mean": jnp.zeros((c,), dtype),
        "running_var": jnp.ones((c,), dtype),
    }


def ln_init(c, dtype=jnp.float32) -> Params:
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ------------------------------------------------------------------- forwards

def conv2d(
    x: jax.Array,
    p: Params,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] | str = 0,
    dilation: int = 1,
    feature_group_count: int = 1,
) -> jax.Array:
    """NHWC conv with HWIO kernel. `padding` int means symmetric SAME-style
    explicit pad (torch semantics)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    w = p["weight"]
    squeeze = x.ndim == 3  # unbatched (H, W, C) input
    if squeeze:
        x = x[None]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y[0] if squeeze else y


def conv_transpose2d(
    x: jax.Array, p: Params, stride: int = 2, padding: int = 1
) -> jax.Array:
    """NHWC transposed conv matching torch ConvTranspose2d semantics.

    Kernel stored HWIO with I=torch-in, O=torch-out (converter flips OIHW and
    spatial axes appropriately)."""
    w = p["weight"]
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding))
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, (0, 1)).astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def batch_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BN using running statistics."""
    inv = jax.lax.rsqrt(p["running_var"].astype(jnp.float32) + eps)
    scale = (p["weight"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        p["bias"].astype(jnp.float32)
        - p["running_mean"].astype(jnp.float32) * p["weight"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + shift


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-6) -> jax.Array:
    mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def linear(x: jax.Array, p: Params) -> jax.Array:
    y = jnp.dot(x, p["weight"].astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def max_pool(x: jax.Array, window: int = 3, stride: int = 2, padding: int = 1) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool_global(x: jax.Array) -> jax.Array:
    """Global average pool over H, W -> (..., 1, 1, C)."""
    return jnp.mean(x, axis=(-3, -2), keepdims=True)


def max_pool_global(x: jax.Array) -> jax.Array:
    return jnp.max(x, axis=(-3, -2), keepdims=True)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def gelu(x: jax.Array) -> jax.Array:
    # exact (erf) gelu like torch nn.GELU(); erf internally upcasts bf16 to
    # f32 — cast back so downstream matmuls stay on the bf16 MXU path
    # (without this the whole following matmul silently runs in fp32).
    return jax.nn.gelu(x, approximate=False).astype(x.dtype)


def gelu_fast(x: jax.Array) -> jax.Array:
    """gelu whose form follows the activation precision: tanh-approx in
    bf16, exact erf otherwise.

    The tanh approximation deviates from erf-gelu by <~1e-3 in output
    units — BELOW the bf16 representation error of the erf result itself
    (~0.4% relative, e.g. ~8e-3 at |x|=2), so at bf16 the approximation is
    invisible at the precision the activations carry while skipping the
    VPU erf polynomial (measured 3.55 ms/frame on the K=8 vit_h encoder
    MLP tower, scripts/exp_gelu.py: erf 14.39 -> tanh 10.84 ms/frame,
    no-act floor 10.41). fp32 paths (torch-parity tests, CPU eval) keep
    the exact erf; tests/test_sam.py::test_gelu_fast_error_below_bf16_noise
    asserts the error ordering at the whole-encoder level."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True).astype(x.dtype)
    return jax.nn.gelu(x, approximate=False).astype(x.dtype)


def interpolate_bilinear(x: jax.Array, scale: float) -> jax.Array:
    """Torch F.interpolate(..., align_corners=False) equivalent (NHWC)."""
    h, w = x.shape[-3], x.shape[-2]
    shape = list(x.shape)
    shape[-3] = int(h * scale)
    shape[-2] = int(w * scale)
    return jax.image.resize(x, shape, method="linear")
