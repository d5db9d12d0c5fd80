"""Training tests: losses math + a real optimizer step that reduces loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import FrameworkConfig, MemoryConfig, XMemConfig
from vosesam_tpu.models.xmem import losses as L
from vosesam_tpu.models.xmem import network as xnet
from vosesam_tpu.training import trainer as T


class TestLosses:
    def test_dice_perfect(self):
        gt = jnp.zeros((2, 8, 8)).at[0, 2:6, 2:6].set(1.0)
        logits = jnp.where(gt > 0, 20.0, -20.0)
        v = jnp.array([True, False])
        assert float(L.dice_loss(logits, gt, v)) < 0.01

    def test_dice_worst(self):
        gt = jnp.zeros((1, 8, 8)).at[0, :4].set(1.0)
        logits = jnp.where(gt > 0, -20.0, 20.0)
        assert float(L.dice_loss(logits, gt, jnp.array([True]))) > 0.9

    def test_bootstrapped_ce_warmup(self):
        logits = jnp.zeros((3, 8, 8))
        target = jnp.zeros((8, 8), jnp.int32)
        # before warmup: mean CE over all pixels = log(3)
        early = L.bootstrapped_ce(logits, target, jnp.int32(0))
        np.testing.assert_allclose(float(early), np.log(3), rtol=1e-5)
        # after warmup with uniform nll, top-p mean is the same
        late = L.bootstrapped_ce(logits, target, jnp.int32(10**6))
        np.testing.assert_allclose(float(late), np.log(3), rtol=1e-5)

    def test_bootstrapped_ce_hard_pixels(self):
        # one very wrong pixel: after warmup the loss focuses on it
        logits = jnp.zeros((2, 4, 4)).at[1].set(5.0)
        target = jnp.zeros((4, 4), jnp.int32)   # bg everywhere; ch1 screams
        early = L.bootstrapped_ce(logits, target, jnp.int32(0))
        late = L.bootstrapped_ce(logits, target, jnp.int32(10**6))
        assert float(late) >= float(early)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self):
        cfg = FrameworkConfig(
            xmem=XMemConfig(key_dim=8, value_dim=16, hidden_dim=4, max_objects=2),
            memory=MemoryConfig(top_k=4),
            dtype="float32",
        )
        tcfg = T.TrainConfig(lr=1e-4, seq_length=3)
        params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)
        state = T.init_train_state(params, tcfg)

        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.normal(size=(1, 3, 32, 32, 3)).astype(np.float32))
        gt = np.zeros((1, 3, 32, 32), np.int32)
        gt[:, :, 8:20, 8:20] = 1
        gt = jnp.asarray(gt)
        ov = jnp.array([[True, False]])

        losses = []
        for _ in range(3):
            state, aux = T.train_step(state, frames, gt, ov, cfg, tcfg)
            losses.append(float(aux["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]   # overfits the single clip

    def test_grad_accum_matches_full_batch(self):
        """grad_accum=2 (sequential microbatches via lax.scan — the
        single-chip path for the standard B=4 recipe that exceeds v5e HBM
        as one batch) computes the same optimizer update as the full-batch
        step, up to summation-order fp noise."""
        cfg = FrameworkConfig(
            xmem=XMemConfig(key_dim=8, value_dim=16, hidden_dim=4,
                            max_objects=2),
            memory=MemoryConfig(top_k=4),
            dtype="float32",
        )
        params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)
        rng = np.random.default_rng(1)
        frames = jnp.asarray(
            rng.normal(size=(4, 3, 32, 32, 3)).astype(np.float32))
        gt = np.zeros((4, 3, 32, 32), np.int32)
        for b in range(4):
            gt[b, :, 6 + b:18 + b, 8:20] = 1
        gt = jnp.asarray(gt)
        ov = jnp.asarray(np.array([[True, False]] * 4))

        outs = {}
        for ga in (1, 2):
            tcfg = T.TrainConfig(seq_length=3, grad_accum=ga)
            state = T.init_train_state(params, tcfg)
            state2, aux = T.train_step(state, frames, gt, ov, cfg, tcfg)
            outs[ga] = (state2, float(aux["loss"]))
        assert outs[1][1] == pytest.approx(outs[2][1], rel=1e-5)
        leaves1 = jax.tree.leaves(outs[1][0].params)
        leaves2 = jax.tree.leaves(outs[2][0].params)
        for l1, l2 in zip(leaves1, leaves2):
            # mean-of-halves vs global-mean fp noise passes through
            # AdamW's sqrt-normalizer: bound the post-update weight delta
            # in ABSOLUTE terms (a few LR=1e-5 quanta), not relative —
            # near-zero-gradient weights amplify relative error
            np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                       rtol=0, atol=5e-5)

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = FrameworkConfig(
            xmem=XMemConfig(key_dim=8, value_dim=16, hidden_dim=4, max_objects=2),
            dtype="float32",
        )
        tcfg = T.TrainConfig()
        params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)
        state = T.init_train_state(params, tcfg)
        state = state._replace(it=jnp.int32(7))
        path = str(tmp_path / "ckpt")
        T.save_checkpoint(state, path)
        fresh = T.init_train_state(params, tcfg)
        restored = T.load_checkpoint(path, fresh)
        assert int(restored.it) == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params["key_proj"]["key_proj"]["weight"]),
            np.asarray(state.params["key_proj"]["key_proj"]["weight"]),
        )
