"""Checkpoint conversion tests.

Two layers of coverage:
  1. Cross-framework numerics parity: tiny torch modules (conv/BN/maxpool/
     linear/bilinear-upsample) vs our functional layers after conversion —
     validates every layout/transposition convention on real torch tensors.
  2. XMem structural round-trip: a synthetic torch-format XMem state_dict
     (built from our randomly-initialized tree) loads back bit-exactly, dims
     are inferred from shapes, and the 4->5 input-channel surgery applies.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from vosesam_tpu.config import XMemConfig  # noqa: E402
from vosesam_tpu.models import layers as L  # noqa: E402
from vosesam_tpu.models.xmem import network as xnet  # noqa: E402
from vosesam_tpu.utils import checkpoint as ckpt  # noqa: E402


class TestTorchParity:
    def test_conv_bn_pool(self, rng):
        tm = torch.nn.Sequential(
            torch.nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False),
            torch.nn.BatchNorm2d(8),
            torch.nn.ReLU(),
            torch.nn.MaxPool2d(3, 2, 1),
            torch.nn.Conv2d(8, 4, 3, padding=1),
        ).eval()
        # randomize BN stats so the test is meaningful
        tm[1].running_mean.normal_()
        tm[1].running_var.uniform_(0.5, 2.0)
        x = rng.normal(size=(1, 3, 32, 40)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        tree = ckpt.state_dict_to_tree(tm.state_dict())
        xj = jnp.array(np.transpose(x, (0, 2, 3, 1)))
        y = L.conv2d(xj, tree["0"], stride=2, padding=3)
        y = L.batch_norm(y, tree["1"])
        y = L.relu(y)
        y = L.max_pool(y, 3, 2, 1)
        y = L.conv2d(y, tree["4"], padding=1)
        got = np.transpose(np.asarray(y), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_linear(self, rng):
        tm = torch.nn.Linear(16, 8).eval()
        x = rng.normal(size=(5, 16)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        tree = ckpt.state_dict_to_tree({"lin.weight": tm.weight, "lin.bias": tm.bias})
        got = np.asarray(L.linear(jnp.array(x), tree["lin"]))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bilinear_upsample(self, rng):
        x = rng.normal(size=(1, 3, 7, 9)).astype(np.float32)
        with torch.no_grad():
            want = torch.nn.functional.interpolate(
                torch.from_numpy(x), scale_factor=2, mode="bilinear", align_corners=False
            ).numpy()
        got = np.transpose(
            np.asarray(L.interpolate_bilinear(jnp.array(np.transpose(x, (0, 2, 3, 1))), 2.0)),
            (0, 3, 1, 2),
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_area_downsample(self, rng):
        from vosesam_tpu.models.xmem.modules import downsample_groups_area
        x = rng.normal(size=(2, 8, 12, 3)).astype(np.float32)
        with torch.no_grad():
            want = torch.nn.functional.interpolate(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), scale_factor=0.5, mode="area"
            ).numpy()
        got = np.transpose(np.asarray(downsample_groups_area(jnp.array(x), 2)), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_conv_transpose(self, rng):
        tm = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1).eval()
        x = rng.normal(size=(1, 6, 8, 10)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        tree = ckpt.state_dict_to_tree(
            {"up.weight": tm.weight, "up.bias": tm.bias},
            transpose_spec={"up.weight": "conv_transpose"},
        )
        got = np.transpose(
            np.asarray(L.conv_transpose2d(jnp.array(np.transpose(x, (0, 2, 3, 1))), tree["up"], 2, 1)),
            (0, 3, 1, 2),
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def tree_to_torch_state_dict(tree, prefix=""):
    """Inverse conversion: our tree -> torch-layout flat state dict."""
    out = {}
    for k, v in tree.items():
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_to_torch_state_dict(v, p))
        else:
            a = np.asarray(v)
            if p.endswith(".weight") and a.ndim == 4:
                a = np.transpose(a, (3, 2, 0, 1))   # HWIO -> OIHW
            elif p.endswith(".weight") and a.ndim == 2:
                a = a.T
            out[p] = torch.from_numpy(np.ascontiguousarray(a))
    return out


class TestXMemRoundTrip:
    @pytest.fixture(scope="class")
    def fake_ckpt(self, tmp_path_factory):
        cfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=4, max_objects=2)
        params = jax.tree.map(np.asarray, xnet.xmem_init(jax.random.PRNGKey(0), cfg))
        sd = tree_to_torch_state_dict(params)
        # rename layer1 -> res2 for the key encoder, as the reference does
        sd = {
            (k.replace("key_encoder.layer1.", "key_encoder.res2.") if k.startswith("key_encoder.layer1.") else k): v
            for k, v in sd.items()
        }
        path = tmp_path_factory.mktemp("ckpt") / "xmem_fake.pth"
        torch.save(sd, str(path))
        return str(path), params, cfg

    def test_roundtrip_exact(self, fake_ckpt):
        path, params, cfg = fake_ckpt
        tree, loaded_cfg = ckpt.load_xmem_checkpoint(path, cfg)
        assert loaded_cfg.key_dim == 8 and loaded_cfg.value_dim == 16
        assert loaded_cfg.hidden_dim == 4
        want = ckpt.tree_shapes(params)
        got = ckpt.tree_shapes(tree)
        assert want == got
        # bit-exact round trip on a few leaves
        np.testing.assert_array_equal(
            tree["key_encoder"]["conv1"]["weight"],
            np.asarray(params["key_encoder"]["conv1"]["weight"]),
        )
        np.testing.assert_array_equal(
            tree["decoder"]["fuser"]["attention"]["ChannelGate"]["mlp"]["1"]["weight"],
            np.asarray(params["decoder"]["fuser"]["attention"]["ChannelGate"]["mlp"]["1"]["weight"]),
        )

    def test_single_to_multi_surgery(self, fake_ckpt, tmp_path):
        path, params, cfg = fake_ckpt
        sd = torch.load(path, weights_only=True)
        sd["value_encoder.conv1.weight"] = sd["value_encoder.conv1.weight"][:, :4]
        p2 = tmp_path / "xmem_so.pth"
        torch.save(sd, str(p2))
        tree, _ = ckpt.load_xmem_checkpoint(str(p2), cfg)
        w = tree["value_encoder"]["conv1"]["weight"]
        assert w.shape == (7, 7, 5, 64)
        assert np.all(w[:, :, 4, :] == 0)  # zero-init padded others-channel

    def test_forward_runs_with_loaded_tree(self, fake_ckpt):
        path, params, cfg = fake_ckpt
        tree, loaded_cfg = ckpt.load_xmem_checkpoint(path, cfg)
        tree = jax.tree.map(jnp.asarray, tree)
        frame = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3))
        key, sh, sel, feats = xnet.encode_key(tree, frame)
        assert key.shape == (2, 2, 8)
