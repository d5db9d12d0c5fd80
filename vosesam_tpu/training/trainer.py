"""XMem trainer: multi-frame unrolled memory-attention training, functional.

Reference: tracker/model/trainer.py — a vestigial torch loop with DDP + AMP
whose imports are broken (trainer.py:15-16; it cannot run, SURVEY.md §2.3).
This one runs: an 8-frame unrolled pass (do_pass :55-117) where frame 0 is
ground truth, later frames read the accumulated in-clip memory with the
train-time FULL softmax affinity (network.py:89-105 — no top-k at training),
per-frame bootstrapped-CE + dice losses, AdamW + MultiStep LR (optax),
bf16 compute with fp32 master params, and data parallelism by sharding the
clip batch over the mesh `data` axis (replacing DDP/NCCL)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.models.layers import Params
from vosesam_tpu.models.xmem import losses as L
from vosesam_tpu.models.xmem import network as xnet
from vosesam_tpu.ops.memory_attention import get_similarity, readout


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-5                   # trainer.py:41 (AdamW)
    weight_decay: float = 0.05
    lr_schedule_steps: Tuple[int, ...] = (80000, 100000)
    lr_schedule_gamma: float = 0.1
    clip_norm: float = 3.0
    seq_length: int = 8                # unrolled frames per clip
    deep_update_prob: float = 0.2
    # Rematerialize each unrolled frame's forward in the backward pass
    # (jax.checkpoint): only the per-frame boundaries (growing memory
    # tokens + hidden) are kept live. Without it the standard recipe
    # (B=4, T=8, 384x384) wants 22.2 GB of 15.75 GB v5e HBM at compile
    # time; with it B=2 runs (452 ms/step measured) and B=4 sits ~1%
    # over — use grad_accum for the full recipe on one chip. ~1/3 more
    # forward FLOPs for ~T-fold less activation memory.
    remat: bool = True
    # Gradient accumulation: split the batch into this many sequential
    # microbatches inside ONE optimizer step (lax.scan forces the
    # serialization, so peak memory is one microbatch's). grad_accum=2
    # fits the standard B=4 recipe on a single v5e chip; the update is
    # numerically the full-batch mean (tests/test_training.py).
    grad_accum: int = 1


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    it: jax.Array


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    boundaries = {s: tcfg.lr_schedule_gamma for s in tcfg.lr_schedule_steps}
    schedule = optax.piecewise_constant_schedule(tcfg.lr, boundaries)
    return optax.chain(
        optax.clip_by_global_norm(tcfg.clip_norm),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay),
    )


def init_train_state(params: Params, tcfg: TrainConfig) -> TrainState:
    opt = make_optimizer(tcfg)
    return TrainState(params, opt.init(params), jnp.int32(0))


def _train_read_memory(
    mem_keys: jax.Array,     # (Tm*HW, Ck)
    mem_shrink: jax.Array,   # (Tm*HW,)
    mem_values: jax.Array,   # (O, Tm*HW, Cv)
    qk: jax.Array,           # (HW, Ck)
    qe: jax.Array,           # (HW, Ck)
) -> jax.Array:
    """Train-time read: FULL softmax affinity (network.py:89-105)."""
    sim = get_similarity(mem_keys, mem_shrink, qk, qe)
    aff = jax.nn.softmax(sim, axis=-1)
    return jax.vmap(lambda v: readout(aff, v))(mem_values)


def clip_forward_loss(
    params: Params,
    frames: jax.Array,       # (T, H, W, 3) normalized
    gt_indexed: jax.Array,   # (T, H, W) int32
    obj_valid: jax.Array,    # (O,)
    it: jax.Array,
    cfg: FrameworkConfig,
    remat: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One clip's unrolled forward + losses (trainer.py:75-117).

    `remat`: checkpoint each frame's body (see TrainConfig.remat)."""
    t, h, w, _ = frames.shape
    o = cfg.xmem.max_objects
    h16, w16 = h // 16, w // 16
    hw = h16 * w16

    gt0 = (gt_indexed[0][None] == jnp.arange(1, o + 1)[:, None, None]).astype(
        frames.dtype
    )
    key0, sh0, sel0, feats0 = xnet.encode_key(params, frames[0])
    hidden = jnp.zeros((o, h16, w16, max(cfg.xmem.hidden_dim, 1)), frames.dtype)
    v0, hidden = xnet.encode_value(
        params, frames[0], feats0.f16, hidden, gt0, obj_valid, cfg.xmem
    )

    mem_keys = key0.reshape(hw, -1)
    mem_shrink = sh0.reshape(hw)
    mem_values = v0.reshape(o, hw, -1)

    def frame_body(params, frame, gt_t, mem_keys, mem_shrink, mem_values,
                   hidden):
        key, sh, sel, feats = xnet.encode_key(params, frame)
        read = _train_read_memory(
            mem_keys, mem_shrink, mem_values,
            key.reshape(hw, -1), sel.reshape(hw, -1),
        ).reshape(o, h16, w16, -1)
        hidden_new, agg_logits, prob = xnet.segment(
            params, feats, read.astype(frame.dtype), hidden, obj_valid,
            cfg.xmem, h_out=True, strip_bg=False,
        )
        hidden2 = hidden_new if hidden_new is not None else hidden
        # per-object logits for the dice term: re-derive from probs
        obj_logits = jnp.log(jnp.clip(prob[1:], 1e-7, 1.0)) - jnp.log(
            jnp.clip(1.0 - prob[1:], 1e-7, 1.0)
        )
        loss, parts = L.frame_loss(agg_logits, obj_logits, gt_t, obj_valid, it)
        # memorize this frame with the PREDICTED mask (self-supervised rollout)
        v, hidden3 = xnet.encode_value(
            params, frame, feats.f16, hidden2, prob[1:], obj_valid, cfg.xmem
        )
        return (loss, parts, key.reshape(hw, -1), sh.reshape(hw),
                v.reshape(o, hw, -1), hidden3)

    # Remat: only each frame's boundary state (growing memory tokens +
    # hidden) stays live through the backward pass; per-frame activations
    # are recomputed (TrainConfig.remat — without this the standard recipe
    # exceeds one v5e's HBM by 6.4 GB).
    step_fn = jax.checkpoint(frame_body) if remat else frame_body

    total = 0.0
    aux: Dict[str, jax.Array] = {}
    for ti in range(1, t):
        loss, parts, k_new, s_new, v_new, hidden = step_fn(
            params, frames[ti], gt_indexed[ti], mem_keys, mem_shrink,
            mem_values, hidden)
        total = total + loss
        if ti == 1:
            aux = parts
        mem_keys = jnp.concatenate([mem_keys, k_new], 0)
        mem_shrink = jnp.concatenate([mem_shrink, s_new], 0)
        mem_values = jnp.concatenate([mem_values, v_new], 1)

    return total / (t - 1), aux


@partial(jax.jit, static_argnames=("cfg", "tcfg"))
def train_step(
    state: TrainState,
    frames: jax.Array,       # (B, T, H, W, 3) normalized
    gt: jax.Array,           # (B, T, H, W) int32
    obj_valid: jax.Array,    # (B, O)
    cfg: FrameworkConfig,
    tcfg: TrainConfig,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One optimizer step over a clip batch. Shard `frames`/`gt` over the
    mesh `data` axis for DP — jit inserts the gradient all-reduce."""

    def loss_fn(params, f, g, v):
        losses, aux = jax.vmap(
            lambda a, b, c: clip_forward_loss(params, a, b, c, state.it, cfg,
                                              remat=tcfg.remat)
        )(f, g, v)
        return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

    ga = tcfg.grad_accum
    if ga > 1:
        b = frames.shape[0]
        if b % ga:
            raise ValueError(f"batch {b} not divisible by grad_accum={ga}")
        mb = b // ga
        reshape = lambda x: x.reshape((ga, mb) + x.shape[1:])

        def micro(carry, xs):
            g_acc, l_acc, a_acc = carry
            (l, a), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, *xs)
            return (jax.tree.map(jnp.add, g_acc, g), l_acc + l,
                    jax.tree.map(jnp.add, a_acc, a)), None

        zero_g = jax.tree.map(jnp.zeros_like, state.params)
        # probe aux structure without computing (abstract eval)
        aux_shape = jax.eval_shape(
            lambda p: loss_fn(p, frames[:mb], gt[:mb], obj_valid[:mb])[1],
            state.params)
        zero_a = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux_shape)
        (grads, loss, aux), _ = jax.lax.scan(
            micro, (zero_g, jnp.float32(0.0), zero_a),
            (reshape(frames), reshape(gt), reshape(obj_valid)))
        grads = jax.tree.map(lambda x: x / ga, grads)
        loss = loss / ga
        aux = jax.tree.map(lambda x: x / ga, aux)
    else:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frames, gt, obj_valid)
    opt = make_optimizer(tcfg)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    aux = dict(aux)
    aux["loss"] = loss
    return TrainState(params, opt_state, state.it + 1), aux


def save_checkpoint(state: TrainState, path: str) -> None:
    """Orbax save (replaces trainer.py:170-224 torch save/load)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "it": state.it})
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path, {"params": state.params, "it": state.it}
    )
    return TrainState(restored["params"], state.opt_state, restored["it"])
