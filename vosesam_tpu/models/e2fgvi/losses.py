"""E2FGVI training losses.

Reference: inpainter/model/modules/flow_comp.py:11-46 `FlowCompletionLoss` —
the only inpainter training loss the reference ships (the trainer itself does
not exist there; the Discriminator lives in models/e2fgvi/discriminator.py).

Functional JAX: the "fixed" SPyNet is just a param tree the caller does not
differentiate through (we stop_gradient the GT flows explicitly, mirroring
the reference's torch.no_grad block).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.models.e2fgvi import modules as M
from vosesam_tpu.models.layers import Params
from vosesam_tpu.ops.image import resize_bilinear_align_corners


def _quarter_flows(spynet_params: Params, frames01: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """(T, H, W, 3) frames in [0,1] -> (fwd, bwd) 1/4-res flows, matching
    generator_forward's flow path (flow_comp.py:25-37: 1/4 bilinear
    align_corners=True downsample, SPyNet on consecutive pairs)."""
    t, h, w, _ = frames01.shape
    small = resize_bilinear_align_corners(frames01, (h // 4, w // 4))
    sh, sw = small.shape[1:3]
    uh = -(-sh // 32) * 32
    uw = -(-sw // 32) * 32
    up = jax.image.resize(small, (t, uh, uw, 3), "linear")
    f_fwd = M.spynet_flow(spynet_params, up[:-1], up[1:])
    f_bwd = M.spynet_flow(spynet_params, up[1:], up[:-1])

    def down(f):
        f = jax.image.resize(f, (t - 1, sh, sw, 2), "linear")
        return f * jnp.array([sw / uw, sh / uh], f.dtype)

    return down(f_fwd), down(f_bwd)


def flow_completion_loss(
    fixed_spynet_params: Params,
    pred_flows: Tuple[jax.Array, jax.Array],   # (fwd, bwd) (T-1, h/4, w/4, 2)
    gt_local_frames01: jax.Array,              # (T, H, W, 3) in [0, 1]
) -> jax.Array:
    """L1 between the generator's completed flows and frozen-SPyNet flows of
    the unmasked frames (flow_comp.py:21-46)."""
    gt_fwd, gt_bwd = _quarter_flows(fixed_spynet_params, gt_local_frames01)
    gt_fwd = jax.lax.stop_gradient(gt_fwd)
    gt_bwd = jax.lax.stop_gradient(gt_bwd)
    fwd_loss = jnp.mean(jnp.abs(pred_flows[0] - gt_fwd))
    bwd_loss = jnp.mean(jnp.abs(pred_flows[1] - gt_bwd))
    return fwd_loss + bwd_loss
