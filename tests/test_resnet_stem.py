"""The space-to-depth stem rewrite must be exact.

resnet_features runs the 7x7/s2 stem conv as a 4x4/s1 conv over a
2x-space-to-depth input when H, W are even (vosesam_tpu/models/resnet.py
_stem) — an MXU-occupancy rewrite of the reference stem
(tracker/model/resnet.py:117-131). These tests pin it to the plain
formulation on even shapes and exercise the odd-shape fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.models import resnet
from vosesam_tpu.models.layers import batch_norm, conv2d, max_pool, relu


def _plain_stem(x, p):
    y = relu(batch_norm(conv2d(x, p["conv1"], stride=2, padding=3), p["bn1"]))
    return max_pool(y, 3, 2, 1)


@pytest.mark.parametrize("arch,extra", [("resnet50", 0), ("resnet18", 2)])
def test_s2d_stem_matches_plain(arch, extra):
    p = resnet.resnet_init(jax.random.PRNGKey(0), arch, extra_dim=extra)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 48, 3 + extra))
    a = jax.jit(_plain_stem)(x, p)
    b = jax.jit(resnet._stem)(x, p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_odd_shape_falls_back():
    p = resnet.resnet_init(jax.random.PRNGKey(0), "resnet50")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 33, 47, 3))
    a = jax.jit(_plain_stem)(x, p)
    b = jax.jit(resnet._stem)(x, p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_features_unchanged_through_trunk():
    """End-to-end trunk output with the s2d stem equals the trunk run on the
    plain stem's activations (the stages are untouched)."""
    p = resnet.resnet_init(jax.random.PRNGKey(2), "resnet18")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 3))
    f4, f8, f16 = jax.jit(lambda x, p: resnet.resnet_features(x, p, "resnet18"))(x, p)

    y = _plain_stem(x, p)
    for si in range(3):
        stage = p[f"layer{si + 1}"]
        for bi in range(len(stage)):
            stride = 1 if (si == 0 or bi > 0) else 2
            y = resnet._basic_block(y, stage[str(bi)], stride)
    np.testing.assert_allclose(np.asarray(f16), np.asarray(y), atol=1e-4)
