"""Inpainter GAN training step: losses finite, params move, SN updates."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import InpainterConfig
from vosesam_tpu.models.e2fgvi import discriminator as D
from vosesam_tpu.models.e2fgvi import generator as G
from vosesam_tpu.training import inpaint_trainer as IT

CFG = InpainterConfig(num_blocks=1)
T, H, W, NL = 3, 48, 48, 2


@pytest.fixture(scope="module")
def tstate():
    gen = G.generator_init(jax.random.PRNGKey(0), CFG)
    disc = D.discriminator_init(jax.random.PRNGKey(1))
    return IT.init_train_state(gen, disc, IT.InpaintTrainConfig())


@pytest.fixture(scope="module")
def batch():
    r = np.random.default_rng(0)
    frames = jnp.asarray(r.uniform(-1, 1, (T, H, W, 3)).astype(np.float32))
    masks = np.zeros((T, H, W, 1), np.float32)
    masks[:, 12:30, 10:36] = 1.0
    return frames, jnp.asarray(masks)


def test_train_step_runs_and_learns(tstate, batch):
    frames, masks = batch
    tcfg = IT.InpaintTrainConfig()
    step = jax.jit(partial(IT.train_step, num_local=NL, cfg=CFG, tcfg=tcfg))
    new_state, metrics = step(tstate, frames, masks)

    for k in ("hole_l1", "valid_l1", "flow_l1", "gen_adv", "gen_total",
              "disc_total", "disc_real", "disc_fake"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["hole_l1"]) > 0
    assert int(new_state.it) == 1

    # generator and discriminator weights both moved
    g0 = tstate.gen["encoder"]
    g1 = new_state.gen["encoder"]
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )
    assert moved
    d_moved = not np.allclose(
        np.asarray(tstate.disc["conv"]["0"]["weight"]),
        np.asarray(new_state.disc["conv"]["0"]["weight"]),
    )
    assert d_moved


def test_spectral_norm_buffers_update_not_trained(tstate, batch):
    """u/v change by power iteration (not by Adam): they stay unit-norm."""
    frames, masks = batch
    tcfg = IT.InpaintTrainConfig()
    step = jax.jit(partial(IT.train_step, num_local=NL, cfg=CFG, tcfg=tcfg))
    new_state, _ = step(tstate, frames, masks)
    u0 = np.asarray(tstate.disc["conv"]["0"]["u"])
    u1 = np.asarray(new_state.disc["conv"]["0"]["u"])
    assert not np.allclose(u0, u1)          # power iteration advanced
    assert np.isclose(np.linalg.norm(u1), 1.0, atol=1e-4)  # still unit vector


def test_masked_l1_normalization():
    pred = jnp.ones((2, 4, 4, 3))
    tgt = jnp.zeros((2, 4, 4, 3))
    mask = jnp.zeros((2, 4, 4, 1)).at[:, :2].set(1.0)
    # |1-0| averaged over masked elements only -> exactly 1
    assert float(IT._masked_l1(pred, tgt, mask)) == pytest.approx(1.0)
    # empty mask -> 0, no nan
    assert float(IT._masked_l1(pred, tgt, jnp.zeros((2, 4, 4, 1)))) == 0.0
