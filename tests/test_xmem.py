"""XMem network shape/behavior tests (random weights, tiny inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import XMemConfig
from vosesam_tpu.models.xmem import network as xnet


@pytest.fixture(scope="module")
def cfg():
    return XMemConfig(max_objects=3)


@pytest.fixture(scope="module")
def params(cfg):
    return xnet.xmem_init(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def frame():
    return jax.random.normal(jax.random.PRNGKey(1), (64, 96, 3))


class TestEncodeKey:
    def test_shapes(self, params, frame, cfg):
        key, shrink, sel, feats = jax.jit(
            lambda p, f: xnet.encode_key(p, f)
        )(params, frame)
        assert key.shape == (4, 6, cfg.key_dim)
        assert shrink.shape == (4, 6, 1)
        assert sel.shape == (4, 6, cfg.key_dim)
        assert feats.f16.shape == (4, 6, 1024)
        assert feats.f8.shape == (8, 12, 512)
        assert feats.f4.shape == (16, 24, 256)
        assert np.all(np.asarray(shrink) >= 1.0)      # d²+1
        s = np.asarray(sel)
        assert s.min() >= 0.0 and s.max() <= 1.0       # sigmoid

    def test_selection_optional(self, params, frame):
        key, shrink, sel, _ = xnet.encode_key(params, frame, need_sk=False, need_ek=False)
        assert shrink is None and sel is None


class TestEncodeValue:
    def test_shapes_and_padding(self, params, frame, cfg):
        O = cfg.max_objects
        masks = jnp.zeros((O, 64, 96)).at[0, 10:30, 20:40].set(1.0).at[1, 40:60, 50:80].set(1.0)
        valid = jnp.array([True, True, False])
        hidden = jnp.zeros((O, 4, 6, cfg.hidden_dim))
        _, _, _, feats = xnet.encode_key(params, frame)
        g, h = jax.jit(
            lambda p, f, f16, hid, m, v: xnet.encode_value(p, f, f16, hid, m, v, cfg)
        )(params, frame, feats.f16, hidden, masks, valid)
        assert g.shape == (O, 4, 6, cfg.value_dim)
        assert h.shape == (O, 4, 6, cfg.hidden_dim)
        # padded object's value must be exactly zero
        assert np.all(np.asarray(g[2]) == 0)

    def test_others_channel(self):
        masks = jnp.zeros((3, 4, 4)).at[0, 0, 0].set(1.0).at[1, 1, 1].set(0.5)
        valid = jnp.array([True, True, False])
        others = np.asarray(xnet.compute_others(masks, valid))
        assert others[0, 1, 1] == 0.5   # object 0 sees object 1
        assert others[1, 0, 0] == 1.0
        assert np.all(others[2] == 0)   # padded object sees nothing
        assert others[0, 0, 0] == 0.0   # not itself


class TestSegment:
    def test_shapes_and_aggregation(self, params, frame, cfg):
        O = cfg.max_objects
        _, _, _, feats = xnet.encode_key(params, frame)
        readout = jax.random.normal(jax.random.PRNGKey(2), (O, 4, 6, cfg.value_dim))
        hidden = jnp.zeros((O, 4, 6, cfg.hidden_dim))
        valid = jnp.array([True, True, False])
        new_h, logits, prob = jax.jit(
            lambda p, f, r, h, v: xnet.segment(p, f, r, h, v, cfg)
        )(params, feats, readout, hidden, valid)
        assert new_h.shape == (O, 4, 6, cfg.hidden_dim)
        assert logits.shape == (1 + O, 64, 96)
        assert prob.shape == (O, 64, 96)      # bg stripped
        full = np.asarray(jax.nn.softmax(logits, axis=0))
        np.testing.assert_allclose(np.asarray(prob), full[1:], atol=1e-5)
        assert np.all(np.asarray(prob[2]) == 0)  # padded object never fires
