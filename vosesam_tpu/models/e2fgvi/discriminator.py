"""T-PatchGAN video discriminator with spectral normalization (training-only
in the reference, but part of the E2FGVI component inventory).

Reference: inpainter/model/e2fgvi_hq.py:271-344 (six 3-D convs, kernel
(3,5,5), stride (1,2,2), LeakyReLU 0.2, spectral norm on all but the last)
and the vendored torch spectral_norm (inpainter/model/modules/
spectral_norm.py:8-160 — power iteration on the (out, rest) weight matrix).

TPU notes: activations are (B, T, H, W, C); the 3-D convolutions run as
`lax.conv_general_dilated` over (T, H, W) with THWIO kernels (MXU-friendly
channel-last). Spectral norm is functional: `u`/`v` power-iteration vectors
live in the param tree, `spectral_normalize` returns the normalized weight
plus updated vectors (the caller threads them; in eval the stored vectors
are used as-is, matching torch's do_power_iteration=False path).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.models.layers import Params

NF = 32
_EPS = 1e-12


def _l2norm(x: jax.Array) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x), _EPS)


def spectral_normalize(
    weight: jax.Array,   # THWIO (kt, kh, kw, cin, cout)
    u: jax.Array,        # (cout,)
    v: jax.Array,        # (prod(rest),)
    update: bool = False,
    n_power_iterations: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """W / sigma_max(W) with torch SpectralNorm semantics: the matrix is the
    (cout, rest) reshape of the OIHW-style weight; returns (w_sn, u, v)."""
    cout = weight.shape[-1]
    # u/v are torch *buffers* (spectral_norm.py:8-160): power-iteration
    # state, never differentiated — without this, the eval-mode
    # `sigma = u @ (wm @ v)` would leak gradients into them.
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    # torch reshapes weight_orig (cout, cin, kt, kh, kw) -> (cout, rest) with
    # rest ordered (cin, kt, kh, kw); replicate that ordering from THWIO.
    wm = jnp.transpose(weight, (4, 3, 0, 1, 2)).reshape(cout, -1)
    if update:
        for _ in range(n_power_iterations):
            v = _l2norm(wm.T @ u)
            u = _l2norm(wm @ v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    sigma = u @ (wm @ v)
    return weight / sigma, u, v


def _conv3d_init(key, kt, kh, kw, cin, cout, bias, sn, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    fan = kt * kh * kw * cin
    p: Params = {
        "weight": jax.random.normal(k1, (kt, kh, kw, cin, cout), dtype)
        * (2.0 / fan) ** 0.5
    }
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    if sn:
        p["u"] = _l2norm(jax.random.normal(k2, (cout,), jnp.float32)).astype(dtype)
        p["v"] = _l2norm(
            jax.random.normal(k3, (kt * kh * kw * cin,), jnp.float32)
        ).astype(dtype)
    return p


def discriminator_init(key, in_channels: int = 3, use_spectral_norm: bool = True,
                       dtype=jnp.float32) -> Params:
    """Layer indices mirror the torch nn.Sequential (conv.0/2/4/6/8/10)."""
    ks = jax.random.split(key, 6)
    chans = [
        (in_channels, NF), (NF, NF * 2), (NF * 2, NF * 4),
        (NF * 4, NF * 4), (NF * 4, NF * 4), (NF * 4, NF * 4),
    ]
    p: Params = {"conv": {}}
    for i, (cin, cout) in enumerate(chans):
        sn = use_spectral_norm and i < 5
        p["conv"][str(2 * i)] = _conv3d_init(
            ks[i], 3, 5, 5, cin, cout, bias=not sn, sn=sn, dtype=dtype
        )
    return p


def _conv3d(x: jax.Array, w: jax.Array, stride, padding) -> jax.Array:
    """(B, T, H, W, C) x THWIO -> (B, T', H', W', Cout)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NTHWC".replace("T", "D"), "DHWIO", "NDHWC"),
    )


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def discriminator_forward(
    params: Params,
    video: jax.Array,          # (B, T, H, W, C) in [-1, 1]
    use_sigmoid: bool = False,
    update_sn: bool = False,
) -> Tuple[jax.Array, Params]:
    """e2fgvi_hq.py:338-344. Returns ((B, T', H', W', C') patch logits,
    params with updated power-iteration vectors when `update_sn`)."""
    x = video
    new_params = {"conv": dict(params["conv"])}
    # layer 0 uses padding=1 on ALL dims (reference's `padding=1`); the rest
    # pad (1, 2, 2)
    paddings = [((1, 1), (1, 1), (1, 1))] + [((1, 1), (2, 2), (2, 2))] * 5
    for i in range(6):
        p = params["conv"][str(2 * i)]
        w = p["weight"]
        if "u" in p:
            w, u, v = spectral_normalize(w, p["u"], p["v"], update=update_sn)
            if update_sn:
                new_params["conv"][str(2 * i)] = {**p, "u": u, "v": v}
        x = _conv3d(x, w, (1, 2, 2), paddings[i])
        if "bias" in p:
            x = x + p["bias"].astype(x.dtype)
        if i < 5:
            x = _leaky(x)
    if use_sigmoid:
        x = jax.nn.sigmoid(x)
    return x, new_params
