"""Bounded-window Pallas deform sampler vs the exact gather path.

deform_patches_bounded (ops/pallas/deform_align.py) must equal the shipped
modulated_deform_conv gathers whenever every corner displacement fits the
window radius, and drop (zero) exactly the out-of-window corner
contributions beyond it. Interpret mode — the TPU lowering is verified
on-chip by scripts/tpu_verify.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vosesam_tpu.models.e2fgvi import modules as M
from vosesam_tpu.ops.pallas import deform_align as DA

H, W, G, KT, CIN = 12, 20, 16, 9, 256


def _inputs(flow_scale, seed=0):
    """flow is tanh-BOUNDED by flow_scale so 'within window' cases are
    provably within: max |corner disp| <= 3 (resid) + flow_scale + 1 (tap)
    + 1 (ceil corner)."""
    r = jax.random.PRNGKey(seed)
    ks = jax.random.split(r, 4)
    x = jax.random.normal(ks[0], (1, H, W, CIN), jnp.float32)
    resid = 3.0 * jnp.tanh(
        jax.random.normal(ks[1], (1, H, W, G, KT, 2), jnp.float32))
    flow = flow_scale * jnp.tanh(jax.random.normal(
        ks[2], (1, H, W, 1, 1, 2), jnp.float32))
    off = (resid + flow).reshape(1, H, W, G * KT * 2)
    mask = jax.nn.sigmoid(
        jax.random.normal(ks[3], (1, H, W, G * KT), jnp.float32))
    return x, off, mask


def _exact_patches(x, off, mask):
    """The shipped 4-gather form's stacked taps (modules.py gather math)."""
    b = 1
    cg = CIN // G
    offr = off.reshape(b, H, W, G, KT, 2)
    m = mask.reshape(b, H, W, G, KT)
    taps = []
    idx = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            o = offr[:, :, :, :, idx, :]
            fl = jnp.stack([o[..., 1] + dx, o[..., 0] + dy], axis=-1)
            xg = x.reshape(b, H, W, G, cg)
            sampled = jax.vmap(
                lambda xx, ff: M.flow_warp(xx, ff),
                in_axes=(3, 3), out_axes=3)(xg, fl)
            taps.append((sampled * m[:, :, :, :, idx][..., None])
                        .reshape(b, H, W, CIN))
            idx += 1
    return jnp.stack(taps, axis=3)[0]          # (H, W, K, CIN)


def _kernel_patches(x, off, mask, radius):
    perm = np.concatenate([DA._field_perm(), DA.CH + DA._field_perm()])
    inv = np.argsort(perm)
    got = DA.deform_patches_bounded(
        x[0], off[0], mask[0], H, W, radius=radius, interpret=True)
    return np.asarray(got)[..., inv]           # back to original channels


class TestBoundedDeformSampler:
    def test_matches_exact_within_window(self):
        """Small flows: every corner fits radius=8 -> equality with the
        gather path (fp32, tolerance covers fma reassociation only)."""
        x, off, mask = _inputs(flow_scale=2.0)
        want = np.asarray(_exact_patches(x, off, mask))
        got = _kernel_patches(x, off, mask, radius=8)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_drops_out_of_window_corners(self):
        """Huge flows: the kernel zeroes out-of-window corner contributions;
        verify against the gather path computed with the SAME drop rule."""
        x, off, mask = _inputs(flow_scale=9.0, seed=1)
        radius = 6

        # reference with drop semantics: zero the weight of any corner whose
        # relative displacement exceeds the radius
        offr = off.reshape(1, H, W, G, KT, 2)
        m = mask.reshape(1, H, W, G, KT)
        cg = CIN // G
        taps = []
        idx = 0
        yy = jnp.arange(H, dtype=jnp.float32)[:, None, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :, None]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                o = offr[0, :, :, :, idx, :]
                ay = yy + (o[..., 0] + dy)
                ax = xx + (o[..., 1] + dx)
                y0 = jnp.floor(ay)
                x0 = jnp.floor(ax)
                wy = ay - y0
                wx = ax - x0
                y0d = y0 - yy
                x0d = x0 - xx

                def gather(yi, xi):
                    inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
                    yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
                    xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
                    idx = yc * W + xc                      # (H, W, G)
                    xg = x[0].reshape(H * W, G, cg)
                    v = jax.vmap(
                        lambda flat, ig: flat[ig.reshape(-1)].reshape(H, W, cg),
                        in_axes=(1, 2), out_axes=2)(xg, idx)  # (H, W, G, cg)
                    return v * inb[..., None].astype(v.dtype)

                def ok(d):
                    return ((d >= -radius) & (d <= radius)).astype(jnp.float32)

                v = (gather(y0, x0) * ((1 - wy) * ok(y0d) * (1 - wx) * ok(x0d))[..., None]
                     + gather(y0, x0 + 1) * ((1 - wy) * ok(y0d) * wx * ok(x0d + 1))[..., None]
                     + gather(y0 + 1, x0) * (wy * ok(y0d + 1) * (1 - wx) * ok(x0d))[..., None]
                     + gather(y0 + 1, x0 + 1) * (wy * ok(y0d + 1) * wx * ok(x0d + 1))[..., None])
                taps.append((v * m[0, :, :, :, idx][..., None])
                            .reshape(H, W, CIN))
                idx += 1
        want = np.asarray(jnp.stack(taps, axis=2))

        got = _kernel_patches(x, off, mask, radius=radius)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
        # sanity: the drop rule actually fired somewhere
        exact = np.asarray(_exact_patches(x, off, mask))
        assert np.abs(exact - want).max() > 1e-3

    def test_full_conv_drop_in(self):
        """modulated_deform_conv_bounded == modulated_deform_conv under
        in-window flows (weight perm + matmul path included)."""
        x, off, mask = _inputs(flow_scale=1.0, seed=2)
        r = jax.random.PRNGKey(7)
        wgt = 0.05 * jax.random.normal(r, (3, 3, CIN, 64), jnp.float32)
        bias = jnp.zeros((64,), jnp.float32)
        want = M.modulated_deform_conv(x, off, mask, wgt, bias, G)
        got = DA.modulated_deform_conv_bounded(
            x, off, mask, wgt, bias, G, radius=8, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
