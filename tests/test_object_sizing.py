"""Per-video object-axis sizing (Tracker._o_cap).

cfg.xmem.max_objects is a validation budget; the Tracker allocates state at
the SEEDED object count and grows it on mid-video annotations
(rings.grow_objects), so decoder/value-encoder/refinement compute scales
with the video's real N — matching the reference's dynamically-sized
tensors (tracker/model/network.py:72-81) under static shapes. Padded
slots are validity-masked everywhere, so capacity never changes results.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import FrameworkConfig, MemoryConfig, RefinementConfig, XMemConfig
from vosesam_tpu.inference import core
from vosesam_tpu.inference.tracker import Tracker
from vosesam_tpu.models.xmem import network as xnet

import jax

H, W = 48, 64


def _cfg(budget: int) -> FrameworkConfig:
    return FrameworkConfig(
        xmem=XMemConfig(max_objects=budget),
        memory=MemoryConfig(
            max_mid_term_frames=3, min_mid_term_frames=2,
            max_long_term_elements=64, num_prototypes=8, top_k=8, mem_every=2,
        ),
        refinement=RefinementConfig(use_refinement=False),
        dtype="float32",
    )


def _params(cfg):
    return xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)


def _frames(n=4):
    r = np.random.default_rng(0)
    base = r.integers(0, 255, (H, W, 3), np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[8 + i:20 + i, 8:28] = [255, 40, 40]
        f[30:40, 40 + i:56 + i] = [40, 255, 40]
        out.append(f)
    return out


def test_state_sized_to_seeded_objects():
    cfg = _cfg(budget=6)
    # params are independent of max_objects (object axis is data, not weights)
    tr = Tracker(_params(cfg), None, cfg, paint=False)
    ann = np.zeros((H, W), np.uint8)
    ann[8:20, 8:28] = 3
    ann[30:40, 40:56] = 7          # non-contiguous palette labels
    frames = _frames()
    mask, logits, _, scores = tr.track(frames[0], ann)
    assert tr._o_cap == 2
    assert tr.state.memory.obj_valid.shape == (2,)
    assert logits.shape == (3, H, W)        # bg + 2 objects, not bg + budget
    mask, logits, _, scores = tr.track(frames[1])
    assert logits.shape == (3, H, W)
    assert len(scores) == len(np.unique(mask)) - 1
    assert tr._track_cfg().xmem.max_objects == 2
    assert tr._track_cfg().memory.live_objects == 2


def test_capacity_never_changes_results():
    """The same video stepped through an O=2 state and an O=5 state (same
    budgetary cfg otherwise) must produce identical masks — the padded
    slots are inert."""
    frames = _frames()
    ann = np.zeros((H, W), np.uint8)
    ann[8:20, 8:28] = 1
    ann[30:40, 40:56] = 2

    outs = {}
    for o in (2, 5):
        cfg = _cfg(budget=o)
        params = _params(cfg)
        st = core.init_tracker_state(cfg, (H, W))
        m = np.zeros((o, H, W), np.float32)
        m[0] = ann == 1
        m[1] = ann == 2
        v = np.zeros((o,), bool)
        v[:2] = True
        st, prob, _ = core.step_with_mask(
            params, st, jnp.asarray(frames[0]), jnp.asarray(m),
            jnp.asarray(v), cfg)
        masks = []
        for f in frames[1:]:
            st, prob, _ = core.step(params, st, jnp.asarray(f), cfg)
            masks.append(np.argmax(np.asarray(prob), axis=0))
        outs[o] = masks

    for a, b in zip(outs[2], outs[5]):
        np.testing.assert_array_equal(a, b)


def test_mid_video_annotation_grows_state():
    cfg = _cfg(budget=4)
    tr = Tracker(_params(cfg), None, cfg, paint=False)
    frames = _frames(6)
    ann = np.zeros((H, W), np.uint8)
    ann[8:20, 8:28] = 9
    tr.track(frames[0], ann)
    assert tr._o_cap == 1
    tr.track(frames[1])
    before = tr.state.memory.work.count

    ann2 = np.zeros((H, W), np.uint8)
    ann2[30:40, 42:58] = 4          # new object, new label
    mask, logits, _, _ = tr.track(frames[2], ann2)
    assert tr._o_cap == 2
    assert tr.state.memory.obj_valid.shape == (2,)
    assert logits.shape == (3, H, W)
    # existing memory content survived the growth
    assert int(np.asarray(tr.state.memory.work.count)) >= int(np.asarray(before))
    # mid-video add drops the shared-validity hint
    assert tr._track_cfg().memory.live_objects is None
    m3, *_ = tr.track(frames[3])
    assert set(np.unique(m3)) <= {0, 9, 4}


def test_budget_still_enforced():
    cfg = _cfg(budget=1)
    tr = Tracker(_params(cfg), None, cfg, paint=False)
    ann = np.zeros((H, W), np.uint8)
    ann[8:20, 8:28] = 1
    ann[30:40, 40:56] = 2
    try:
        tr.track(_frames()[0], ann)
    except ValueError as e:
        assert "exceed" in str(e)
    else:
        raise AssertionError("budget violation not raised")
