"""Flash-attention kernel parity vs the XLA reference path (interpret mode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.ops.pallas.flash_attention import flash_attention_relpos


def xla_reference(q, k, v, bias_h, bias_w, grid_hw):
    heads, n, d = q.shape
    gh, gw = grid_hw
    scale = 1.0 / math.sqrt(d)
    attn = jnp.einsum("hqd,hkd->hqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(heads, n, n)
    attn = jax.nn.softmax(attn + bias, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", attn, v.astype(jnp.float32))


@pytest.mark.parametrize("gh,gw,d", [(16, 16, 64), (16, 16, 80)])
def test_flash_matches_xla(rng, gh, gw, d):
    heads, n = 2, gh * gw
    q = jnp.asarray(rng.normal(size=(heads, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(heads, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(heads, n, d)).astype(np.float32))
    bh = jnp.asarray(rng.normal(size=(heads, n, gh)).astype(np.float32))
    bw = jnp.asarray(rng.normal(size=(heads, n, gw)).astype(np.float32))
    got = flash_attention_relpos(q, k, v, bh, bw, (gh, gw), interpret=True)
    want = xla_reference(q, k, v, bh, bw, (gh, gw))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_window_kernel_matches_xla(rng):
    from vosesam_tpu.ops.pallas.flash_attention import window_attention_relpos

    w, heads, wh, ww, d = 3, 2, 5, 9, 64   # non-multiple-of-8 token count
    t = wh * ww
    q = jnp.asarray(rng.normal(size=(w, heads, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(w, heads, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, heads, t, d)).astype(np.float32))
    bh = jnp.asarray(rng.normal(size=(w, heads, t, wh)).astype(np.float32))
    bw = jnp.asarray(rng.normal(size=(w, heads, t, ww)).astype(np.float32))
    got = window_attention_relpos(q, k, v, bh, bw, (wh, ww), interpret=True)
    want = jax.vmap(lambda *a: xla_reference(*a, (wh, ww)))(q, k, v, bh, bw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_encoder_flash_path_matches_xla_path(rng):
    """End-to-end: vit_encode with flash on vs off gives the same embedding."""
    import dataclasses

    from vosesam_tpu.config import SAMConfig
    from vosesam_tpu.models.sam import image_encoder

    cfg_flash = SAMConfig(
        model_type="vit_b", image_size=256, window_size=7,
        vit_dims=(("vit_b", 96, 2, 3, (1,)),), use_flash_attention=True,
    )
    cfg_xla = dataclasses.replace(cfg_flash, use_flash_attention=False)
    params = image_encoder.vit_init(jax.random.PRNGKey(0), cfg_flash)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 256, 3))
    a = image_encoder.vit_encode(params, x, cfg_flash)
    b = image_encoder.vit_encode(params, x, cfg_xla)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_window_kernel_mh_matches_xla(rng):
    from vosesam_tpu.ops.pallas.flash_attention import (
        window_attention_relpos_mh,
    )

    w, heads, wh, ww, d = 3, 4, 5, 9, 80
    t = wh * ww
    q = jnp.asarray(rng.normal(size=(w, heads, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(w, heads, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(w, heads, t, d)).astype(np.float32))
    bh = jnp.asarray(rng.normal(size=(w, heads, t, wh)).astype(np.float32))
    bw = jnp.asarray(rng.normal(size=(w, heads, t, ww)).astype(np.float32))
    got = window_attention_relpos_mh(q, k, v, bh, bw, (wh, ww), interpret=True)
    want = jax.vmap(lambda *a: xla_reference(*a, (wh, ww)))(q, k, v, bh, bw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("impl", ["pallas", "pallas_mh", "xla_fused_bias"])
def test_encoder_windowed_impl_matches_xla(rng, impl):
    """vit_encode with the alternate windowed impls (Pallas kernels, bias
    folded into the QK matmul) == the plain XLA windowed path."""
    import dataclasses

    from vosesam_tpu.config import SAMConfig
    from vosesam_tpu.models.sam import image_encoder

    cfg_xla = SAMConfig(
        model_type="vit_b", image_size=256, window_size=7,
        vit_dims=(("vit_b", 96, 2, 3, (1,)),), use_flash_attention=True,
        windowed_attention_impl="xla",
    )
    cfg_pl = dataclasses.replace(cfg_xla, windowed_attention_impl=impl)
    params = image_encoder.vit_init(jax.random.PRNGKey(0), cfg_xla)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 256, 3))
    a = image_encoder.vit_encode(params, x, cfg_xla)
    b = image_encoder.vit_encode(params, x, cfg_pl)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)
