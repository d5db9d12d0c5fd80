"""Whole-model numerical parity: reference E2FGVI-HQ (torch) vs this
framework's JAX generator.

The reference generator (inpainter/model/e2fgvi_hq.py:134) imports mmcv ops
that are absent here; this module registers FUNCTIONAL shims first:
  - mmcv.ops.modulated_deform_conv2d — a pure-torch grid_sample reference
    implementation of modulated deformable convolution (the semantics the
    JAX gather+matmul version in models/e2fgvi/modules.py:151 must match);
  - mmcv.cnn.ConvModule — conv (+ReLU) wrapper with mmcv's `conv` child name
    so state-dict paths line up;
  - mmengine constant_init / load_checkpoint (no-op: no egress, and parity
    wants random weights anyway).

Then: build the torch InpaintGenerator with random weights, convert the
state dict, and assert the FULL forward (SPyNet flows, deformable
bidirectional propagation, 8 temporal-focal blocks, decoder) matches
generator_forward within fp32 tolerance.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)  # append: don't shadow repo-root modules (app.py)


# ------------------------------------------------------------ mmcv/mmengine shims

def _torch_modulated_deform_conv2d(
    x, offset, mask, weight, bias, stride=1, padding=1, dilation=1,
    groups=1, deform_groups=1,
):
    """Reference CPU implementation (3x3, stride 1, dil 1, groups 1)."""
    b, cin, h, w = x.shape
    g = deform_groups
    cg = cin // g
    off = offset.view(b, g, 9, 2, h, w)
    msk = mask.view(b, g, 9, h, w)
    yy, xx = torch.meshgrid(
        torch.arange(h, dtype=x.dtype), torch.arange(w, dtype=x.dtype),
        indexing="ij",
    )
    cols = []
    ki = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sy = yy + dy + off[:, :, ki, 0]
            sx = xx + dx + off[:, :, ki, 1]
            gx = 2.0 * sx / max(w - 1, 1) - 1.0
            gy = 2.0 * sy / max(h - 1, 1) - 1.0
            grid = torch.stack([gx, gy], dim=-1).view(b * g, h, w, 2)
            v = F.grid_sample(
                x.reshape(b * g, cg, h, w), grid, mode="bilinear",
                padding_mode="zeros", align_corners=True,
            )
            v = v.view(b, g, cg, h, w) * msk[:, :, ki].unsqueeze(2)
            cols.append(v.reshape(b, cin, h, w))
            ki += 1
    patches = torch.stack(cols, dim=2).reshape(b, cin * 9, h * w)
    wmat = weight.reshape(weight.shape[0], -1)  # (cout, cin*9)
    out = torch.einsum("ok,bkl->bol", wmat, patches).view(b, -1, h, w)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class _ModulatedDeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deform_groups=1, bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels, kernel_size, kernel_size)
        )
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None


def _install_shims():
    if "mmcv" in sys.modules:
        return
    mmcv = types.ModuleType("mmcv")
    ops = types.ModuleType("mmcv.ops")
    cnn = types.ModuleType("mmcv.cnn")
    ops.ModulatedDeformConv2d = _ModulatedDeformConv2d
    ops.modulated_deform_conv2d = _torch_modulated_deform_conv2d

    class ConvModule(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, norm_cfg=None, act_cfg=None, **kw):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride, padding)
            self._act = act_cfg is not None

        def forward(self, x):
            x = self.conv(x)
            return F.relu(x) if self._act else x

    cnn.ConvModule = ConvModule
    mmcv.ops = ops
    mmcv.cnn = cnn

    mmengine = types.ModuleType("mmengine")
    mm_model = types.ModuleType("mmengine.model")
    mm_runner = types.ModuleType("mmengine.runner")

    def constant_init(module, val, bias=0):
        nn.init.constant_(module.weight, val)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    mm_model.constant_init = constant_init
    mm_runner.load_checkpoint = lambda *a, **k: None
    mmengine.model = mm_model
    mmengine.runner = mm_runner

    for name, mod in (
        ("mmcv", mmcv), ("mmcv.ops", ops), ("mmcv.cnn", cnn),
        ("mmengine", mmengine), ("mmengine.model", mm_model),
        ("mmengine.runner", mm_runner),
    ):
        sys.modules[name] = mod


_install_shims()

from inpainter.model.e2fgvi_hq import InpaintGenerator as RefGenerator  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vosesam_tpu.config import InpainterConfig  # noqa: E402
from vosesam_tpu.models.e2fgvi import generator as G  # noqa: E402
from vosesam_tpu.models.e2fgvi import modules as EM  # noqa: E402
from vosesam_tpu.utils.checkpoint import state_dict_to_tree  # noqa: E402

# 480p pads to (240, 432) multiples at ratio 0.5; the smallest shape the
# focal windows (5, 9) tile exactly at 1/4 feature res is (120, 216).
T, LT, H, W = 4, 3, 120, 216


@pytest.fixture(scope="module")
def ref_gen():
    torch.manual_seed(0)
    return RefGenerator(init_weights=False).eval()


@pytest.fixture(scope="module")
def jax_params(ref_gen):
    sd = {k: v.detach().cpu() for k, v in ref_gen.state_dict().items()}
    sd = {k: v for k, v in sd.items() if not k.endswith(("mean", "std"))}
    return state_dict_to_tree(sd)


def test_deform_conv_parity(rng):
    """modulated_deform_conv (JAX gather+matmul) vs the torch grid_sample
    reference implementation."""
    b, h, w, cin, cout, g = 1, 12, 16, 32, 16, 4
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * g * 9)) * 2).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, g * 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)

    out_j = EM.modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), g,
    )

    # torch layout: NCHW; offsets (B, G*9*2, H, W) with (y, x) innermost
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ot = torch.from_numpy(offset.transpose(0, 3, 1, 2))
    mt = torch.from_numpy(mask.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(weight.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    with torch.no_grad():
        out_t = _torch_modulated_deform_conv2d(
            xt, ot, mt, wt, torch.from_numpy(bias), deform_groups=g,
        )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
        atol=2e-4, rtol=1e-3,
    )


@pytest.mark.slow
def test_generator_forward_parity(ref_gen, jax_params, rng):
    """Full InpaintGenerator forward (e2fgvi_hq.py:235-263): flows, deform
    propagation, 8 focal blocks, decoder."""
    frames = (rng.uniform(-1, 1, (T, H, W, 3))).astype(np.float32)

    with torch.no_grad():
        out_t, flows_t = ref_gen(
            torch.from_numpy(frames.transpose(0, 3, 1, 2))[None], LT
        )

    cfg = InpainterConfig()
    out_j, flows_j = G.generator_forward(jax_params, jnp.asarray(frames), LT, cfg)

    # Flows accumulate tiny resize-kernel differences through 6 coarse-to-fine
    # levels; bound worst-case sub-pixel error and mean drift.
    ff_t = flows_t[0][0].permute(0, 2, 3, 1).numpy()
    fb_t = flows_t[1][0].permute(0, 2, 3, 1).numpy()
    for fj, ft in ((flows_j[0], ff_t), (flows_j[1], fb_t)):
        diff = np.abs(np.asarray(fj) - ft)
        assert diff.max() < 5e-2, f"flow max err {diff.max()}"
        assert diff.mean() < 2e-3, f"flow mean err {diff.mean()}"

    out_ref = out_t.view(T, 3, H, W).permute(0, 2, 3, 1).numpy()
    err = np.abs(np.asarray(out_j) - out_ref).max()
    assert err < 2e-2, f"generator output max err {err}"


def test_discriminator_parity(rng):
    """T-PatchGAN discriminator forward (e2fgvi_hq.py:271-344) with spectral
    norm vs torch, converted weights, eval mode (stored u/v, no iteration)."""
    from inpainter.model.e2fgvi_hq import Discriminator as RefDisc

    from vosesam_tpu.models.e2fgvi.discriminator import (
        discriminator_forward,
    )

    torch.manual_seed(1)
    ref = RefDisc(use_sigmoid=False, use_spectral_norm=True,
                  init_weights=False).eval()
    # one forward to settle the power-iteration buffers like training would
    warm = torch.from_numpy(
        rng.uniform(-1, 1, (1, 4, 3, 32, 48)).astype(np.float32))
    with torch.no_grad():
        ref(warm)

    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    params = {"conv": {}}
    for i in range(6):
        key = f"conv.{2 * i}"
        p = {}
        if f"{key}.weight_orig" in sd:
            w = sd[f"{key}.weight_orig"]       # (cout, cin, kt, kh, kw)
            p["u"] = sd[f"{key}.weight_u"]
            p["v"] = sd[f"{key}.weight_v"]
        else:
            w = sd[f"{key}.weight"]
        p["weight"] = np.transpose(w, (2, 3, 4, 1, 0))  # -> THWIO
        if f"{key}.bias" in sd:
            p["bias"] = sd[f"{key}.bias"]
        params["conv"][str(2 * i)] = {k: jnp.asarray(v) for k, v in p.items()}

    x = rng.uniform(-1, 1, (1, 4, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
    out_j, _ = discriminator_forward(params, jnp.asarray(x))
    ref_np = out_t.numpy().transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(out_j), ref_np, atol=2e-4, rtol=1e-3)


# --------------------------------------------------------- non-HQ variant

def test_nonhq_softcomp_parity(rng):
    """The original (non-HQ) E2FGVI's SoftComp — learned additive
    (C, 60, 108) bias instead of the HQ bias conv
    (inpainter/model/modules/tfocal_transformer.py:49-72) — vs our
    key-presence-dispatched soft_comp."""
    from inpainter.model.modules.tfocal_transformer import SoftComp as RefSC

    channel, hidden = 128, 512
    kernel, stride, padding = (7, 7), (3, 3), (3, 3)
    out_size = (60, 108)
    torch.manual_seed(1)
    ref = RefSC(channel, hidden, out_size, kernel, stride, padding).eval()
    with torch.no_grad():
        ref.bias.copy_(torch.randn_like(ref.bias) * 0.1)

    sd = {k: v.detach().cpu() for k, v in ref.state_dict().items()}
    tree = state_dict_to_tree(sd, transpose_spec={"bias": "chw_to_hwc"})

    fh = (out_size[0] + 2 * padding[0] - kernel[0]) // stride[0] + 1
    fw = (out_size[1] + 2 * padding[1] - kernel[1]) // stride[1] + 1
    t = 3
    x = rng.standard_normal((t, fh * fw, hidden)).astype(np.float32)

    with torch.no_grad():
        # ref takes (B, T, fh, fw, hidden) with explicit t
        out_t = ref(torch.from_numpy(x.reshape(1, t, fh, fw, hidden)), t)
    got = EM.soft_comp(tree, jnp.asarray(x), out_size, kernel, stride, padding)
    want = out_t.view(t, channel, *out_size).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_nonhq_generator_forward_smoke():
    """InpainterConfig(hq=False): the non-HQ generator runs at its fixed
    240x432 size (the only size the reference variant supports) and the
    checkpoint-layout bias loads through the e2fgvi loader path."""
    cfg = InpainterConfig(hq=False, num_blocks=2)
    params = G.generator_init(jax.random.PRNGKey(0), cfg)
    assert "bias" in params["sc"] and "bias_conv" not in params["sc"]
    assert params["sc"]["bias"].shape == (60, 108, 128)
    frames = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4, 240, 432, 3)),
        jnp.float32)
    out, flows = jax.jit(
        lambda p, f: G.generator_forward(p, f, 3, cfg))(params, frames)
    assert out.shape == (4, 240, 432, 3)
    assert np.isfinite(np.asarray(out)).all()
