"""E2FGVI inpainter training step: generator + T-PatchGAN, functional.

The reference ships the training-only modules — the spectral-norm
Discriminator (inpainter/model/e2fgvi_hq.py:271-344) and FlowCompletionLoss
(inpainter/model/modules/flow_comp.py:11-46) — but no trainer (its training
code is vestigial, SURVEY.md §2.9). This implements the standard E2FGVI
training recipe those modules exist for, TPU-first:

  gen loss  = hole L1 + valid L1 + flow-completion L1 + adversarial (hinge)
  disc loss = hinge real/fake on composited videos, spectral norm updated
              by power iteration each step

Everything is one jittable function over explicit state; GAN alternation is
simultaneous (gen grads use the current disc, disc grads use the detached
composite), which is how the torch recipe behaves within one iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from vosesam_tpu.config import InpainterConfig
from vosesam_tpu.models.e2fgvi import discriminator as D
from vosesam_tpu.models.e2fgvi import generator as G
from vosesam_tpu.models.e2fgvi.losses import flow_completion_loss
from vosesam_tpu.models.layers import Params


@dataclasses.dataclass(frozen=True)
class InpaintTrainConfig:
    lr: float = 1e-4                  # upstream E2FGVI Adam(1e-4, (0, 0.99))
    beta1: float = 0.0
    beta2: float = 0.99
    hole_weight: float = 1.0
    valid_weight: float = 1.0
    flow_weight: float = 1.0
    adversarial_weight: float = 0.01
    # Stage-level generator remat in the gen backward pass (see
    # generator_forward(remat=...)): required to fit the standard T=8
    # 240x432 step on one v5e chip.
    remat: bool = True


class InpaintTrainState(NamedTuple):
    gen: Params
    disc: Params
    gen_opt: optax.OptState
    disc_opt: optax.OptState
    it: jax.Array
    # Frozen pretrained SPyNet for flow-completion GT flows. The reference's
    # FlowCompletionLoss holds its OWN SPyNet copy, frozen at the pretrained
    # weights (flow_comp.py:15-17, loaded at :62) — it must NOT be the
    # generator's live update_spynet, which trains via pred_flows and would
    # let the GT target drift toward a degenerate pred==gt minimum.
    spynet_frozen: Params


def make_optimizer(tcfg: InpaintTrainConfig) -> optax.GradientTransformation:
    return optax.adam(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2)


def init_train_state(
    gen_params: Params, disc_params: Params, tcfg: InpaintTrainConfig,
    spynet_frozen: Params | None = None,
) -> InpaintTrainState:
    """`spynet_frozen` should be the pretrained SPyNet weights; defaults to a
    snapshot of the generator's SPyNet at init (correct when gen was just
    loaded from the pretrained checkpoint)."""
    opt = make_optimizer(tcfg)
    if spynet_frozen is None:
        spynet_frozen = jax.tree_util.tree_map(
            jnp.copy, gen_params["update_spynet"])
    return InpaintTrainState(
        gen_params, disc_params, opt.init(gen_params), opt.init(disc_params),
        jnp.int32(0), spynet_frozen,
    )


def _masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """torch recipe: l1_loss(pred*mask, gt*mask) / mean(mask) — both means
    over their own element counts, so the (broadcast) channel axis cancels."""
    return jnp.mean(jnp.abs(pred - target) * mask) / jnp.maximum(
        jnp.mean(mask), 1e-8)


def train_step(
    state: InpaintTrainState,
    frames: jax.Array,        # (T, H, W, 3) ground truth in [-1, 1]
    masks: jax.Array,         # (T, H, W, 1) 1 = hole to inpaint
    num_local: int,
    cfg: InpainterConfig,
    tcfg: InpaintTrainConfig,
) -> Tuple[InpaintTrainState, Dict[str, jax.Array]]:
    opt = make_optimizer(tcfg)
    masked = frames * (1.0 - masks)

    def gen_loss_fn(gen_params):
        pred, pred_flows = G.generator_forward(gen_params, masked, num_local,
                                               cfg, remat=tcfg.remat)
        comp = frames * (1.0 - masks) + pred * masks
        hole = _masked_l1(pred, frames, masks)
        valid = _masked_l1(pred, frames, 1.0 - masks)
        # GT flows from the FROZEN pretrained SPyNet in the train state
        # (flow_comp.py:15-17 — a separate frozen copy, never the live
        # update_spynet); frames mapped to [0, 1] as in forward_bidirect_flow
        flow = flow_completion_loss(
            state.spynet_frozen, pred_flows, (frames[:num_local] + 1.0) / 2.0)
        d_fake, _ = D.discriminator_forward(state.disc, comp[None])
        adv = -jnp.mean(d_fake)       # hinge generator term
        total = (tcfg.hole_weight * hole + tcfg.valid_weight * valid
                 + tcfg.flow_weight * flow + tcfg.adversarial_weight * adv)
        return total, {
            "hole_l1": hole, "valid_l1": valid, "flow_l1": flow,
            "gen_adv": adv, "gen_total": total,
            "comp": jax.lax.stop_gradient(comp),
        }

    (gen_total, aux), gen_grads = jax.value_and_grad(
        gen_loss_fn, has_aux=True)(state.gen)
    comp = aux.pop("comp")

    def disc_loss_fn(disc_params):
        # torch spectral_norm runs one power iteration on EVERY train-mode
        # forward; thread the updated u/v from the real pass into the fake
        # pass (and iterate there too) to match that cadence — u/v are
        # stop-gradient buffers, weights in new_disc alias disc_params, so
        # gradient flow is unchanged.
        d_real, new_disc = D.discriminator_forward(
            disc_params, frames[None], update_sn=True)
        d_fake, new_disc = D.discriminator_forward(
            new_disc, comp[None], update_sn=True)
        real = jnp.mean(jax.nn.relu(1.0 - d_real))
        fake = jnp.mean(jax.nn.relu(1.0 + d_fake))
        return (real + fake) / 2.0, (real, fake, new_disc)

    (disc_total, (d_real_l, d_fake_l, disc_sn)), disc_grads = (
        jax.value_and_grad(disc_loss_fn, has_aux=True)(state.disc))

    gen_updates, gen_opt = opt.update(gen_grads, state.gen_opt, state.gen)
    new_gen = optax.apply_updates(state.gen, gen_updates)
    disc_updates, disc_opt = opt.update(disc_grads, state.disc_opt, disc_sn)
    new_disc = optax.apply_updates(disc_sn, disc_updates)

    metrics = dict(aux)
    metrics.update({
        "disc_total": disc_total, "disc_real": d_real_l,
        "disc_fake": d_fake_l,
    })
    return (
        InpaintTrainState(new_gen, new_disc, gen_opt, disc_opt, state.it + 1,
                          state.spynet_frozen),
        metrics,
    )
