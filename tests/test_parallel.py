"""Multi-device tests on the virtual 8-CPU mesh: DP evaluation step,
TP param sharding, batched-state mechanics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import (
    FrameworkConfig,
    MemoryConfig,
    ParallelConfig,
    RefinementConfig,
    SAMConfig,
    XMemConfig,
)
from vosesam_tpu.models.sam import predictor
from vosesam_tpu.models.xmem import network as xnet
from vosesam_tpu.parallel import evaluation, mesh as meshlib

H, W = 32, 32

CFG = FrameworkConfig(
    xmem=XMemConfig(max_objects=2),
    memory=MemoryConfig(
        max_mid_term_frames=3, min_mid_term_frames=2,
        max_long_term_elements=32, num_prototypes=4, top_k=4, mem_every=2,
    ),
    sam=SAMConfig(model_type="vit_b", image_size=64, window_size=4,
                  vit_dims=(("vit_b", 32, 2, 2, (1,)),)),
    refinement=RefinementConfig(use_refinement=False, min_region_area=5.0),
    dtype="float32",
)


@pytest.fixture(scope="module")
def mesh():
    return meshlib.make_mesh(CFG.parallel)


@pytest.fixture(scope="module")
def xmem_params():
    return xnet.xmem_init(jax.random.PRNGKey(0), CFG.xmem)


def batch_inputs(b=8):
    r = np.random.default_rng(0)
    frames = r.integers(0, 255, (b, H, W, 3), np.uint8)
    masks = np.zeros((b, 2, H, W), np.float32)
    masks[:, 0, 8:20, 8:24] = 1.0
    valid = np.zeros((b, 2), bool)
    valid[:, 0] = True
    return jnp.asarray(frames), jnp.asarray(masks), jnp.asarray(valid)


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.devices.shape == (8, 1)
        assert mesh.axis_names == ("data", "model")

    def test_tp_mesh(self):
        cfg = ParallelConfig(model_parallel=2)
        m = meshlib.make_mesh(cfg)
        assert m.devices.shape == (4, 2)

    def test_sam_tp_sharding(self):
        cfg = ParallelConfig(model_parallel=2)
        m = meshlib.make_mesh(cfg)
        sp = predictor.sam_init(jax.random.PRNGKey(1), CFG.sam)
        sharded = meshlib.shard_sam_params_tp(sp, m, cfg)
        qkv = sharded.image_encoder["blocks"]["0"]["attn"]["qkv"]["weight"]
        # column-parallel: output dim split over 2 model shards
        shard_shapes = {s.data.shape for s in qkv.addressable_shards}
        assert shard_shapes == {(32, 96 // 2)}
        lin2 = sharded.image_encoder["blocks"]["0"]["mlp"]["lin2"]["weight"]
        assert {s.data.shape for s in lin2.addressable_shards} == {(64, 32)}


class TestTensorParallelEquivalence:
    def test_tp_vit_encode_matches_single_device(self):
        """The megatron-style TP-sharded ViT encode must produce the SAME
        numbers as the unsharded encode — real vit_b dims (768 wide, 12
        blocks, 12 heads) at image_size 256, (4 data x 2 model) CPU mesh.
        XLA inserts the all-reduces from the placements alone; only
        reduction-order noise is tolerated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vosesam_tpu.models.sam import image_encoder

        cfg = SAMConfig(model_type="vit_b", image_size=256,
                        use_flash_attention=False,
                        windowed_attention_impl="xla")
        params = image_encoder.vit_init(jax.random.PRNGKey(2), cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (256, 256, 3)) * 0.1

        want = jax.jit(
            lambda p, xx: image_encoder.vit_encode(p, xx, cfg))(params, x)

        pcfg = ParallelConfig(model_parallel=2)
        m = meshlib.make_mesh(pcfg)
        sp = predictor.SamParams(params, {}, {})
        sharded = meshlib.shard_sam_params_tp(sp, m, pcfg)

        got = jax.jit(
            lambda p, xx: image_encoder.vit_encode(p, xx, cfg),
            out_shardings=NamedSharding(m, P()),
        )(sharded.image_encoder, jax.device_put(x, NamedSharding(m, P())))

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


class TestBatchedEvaluation:
    def test_dp_step_runs_and_matches_single(self, mesh, xmem_params):
        b = 8
        frames, masks, valid = batch_inputs(b)
        states = evaluation.init_batched_state(CFG, (H, W), b)
        states = meshlib.shard_batch(states, mesh, CFG.parallel)
        step = evaluation.make_batched_step(CFG, mesh)

        first = jnp.ones((b,), bool)
        states, indexed, scores = step(
            xmem_params, None, states, frames, first, masks, valid
        )
        assert indexed.shape == (b, H, W)
        # all videos identical: results identical across the batch
        np.testing.assert_array_equal(np.asarray(indexed[0]), np.asarray(indexed[3]))

        # propagation step
        first = jnp.zeros((b,), bool)
        states, indexed2, scores2 = step(
            xmem_params, None, states, frames, first, masks, valid
        )
        assert int(states.curr_ti[0]) == 1
        # matches the single-video reference path
        from vosesam_tpu.inference import core
        st1 = core.init_tracker_state(CFG, (H, W))
        st1, p1, _ = core.step_with_mask(
            xmem_params, st1, frames[0], masks[0], valid[0], CFG
        )
        st1, p2, _ = core.step(xmem_params, st1, frames[0], CFG)
        single_idx = np.asarray(jnp.argmax(p2, 0))
        np.testing.assert_array_equal(np.asarray(indexed2[0]), single_idx)

    @pytest.mark.slow
    def test_dp_step_with_refinement(self, mesh, xmem_params):
        cfg = dataclasses.replace(
            CFG, refinement=RefinementConfig(use_refinement=True, min_region_area=5.0)
        )
        sp = predictor.sam_init(jax.random.PRNGKey(1), cfg.sam)
        b = 8
        frames, masks, valid = batch_inputs(b)
        states = evaluation.init_batched_state(cfg, (H, W), b)
        step = evaluation.make_batched_step(cfg, mesh)
        first = jnp.ones((b,), bool)
        states, indexed, scores = step(xmem_params, sp, states, frames, first, masks, valid)
        first = jnp.zeros((b,), bool)
        states, indexed, scores = step(xmem_params, sp, states, frames, first, masks, valid)
        assert indexed.shape == (b, H, W)
        # valid objects get finite scores; padded slots are -inf by design
        assert np.isfinite(np.asarray(scores)[:, 0]).all()
        assert np.all(np.asarray(scores)[:, 1] == -np.inf)


class TestShardedMemoryRollout:
    # 4 shards, not 8: this box has ONE physical core, and XLA:CPU's
    # collective rendezvous hard-aborts (40 s timeout) when 8 virtual
    # device threads contend for it; 4 tests the identical code path.

    def test_120_frame_manager_rollout_matches_single_device(self):
        """ParallelConfig.memory_axis_shards through the REAL manager
        read/write path (match_memory + add_memory, LT consolidation
        firing) over a 120-frame rollout == the single-device read, frame
        by frame. (The full conv-net core.step wiring is covered by the
        short smoke below; 2x 120 full-network frames are minutes on this
        one-core host.)"""
        from vosesam_tpu.memory import manager, rings

        mcfg = MemoryConfig(
            max_mid_term_frames=3, min_mid_term_frames=2,
            max_long_term_elements=32, num_prototypes=4, top_k=4,
            mem_every=2, fused_read=False,
        )   # LT(32) + work(3 frames x 8 tokens) = 56 slots, %4==0
        xcfg = XMemConfig(max_objects=2, key_dim=16, value_dim=24,
                          hidden_dim=8)
        h16, w16 = 4, 2
        hw = h16 * w16
        pc = ParallelConfig(memory_axis_shards=4)
        r = np.random.default_rng(0)

        read_j = jax.jit(manager.match_memory, static_argnums=(3, 4))
        add_j = jax.jit(manager.add_memory, static_argnums=(6, 7))

        def roll(pcfg):
            st = rings.init_memory(mcfg, xcfg, (h16, w16))
            st = st.replace(obj_valid=jnp.asarray([True, False]))
            reads = []
            rr = np.random.default_rng(7)
            for i in range(120):
                qk = jnp.asarray(rr.standard_normal((h16, w16, 16)), jnp.float32)
                qe = jnp.asarray(rr.uniform(0, 1, (h16, w16, 16)), jnp.float32)
                out, st = read_j(st, qk, qe, mcfg, pcfg)
                reads.append(np.asarray(out))
                if i % mcfg.mem_every == 0:
                    sh = jnp.asarray(rr.uniform(1, 4, (h16, w16, 1)), jnp.float32)
                    val = jnp.asarray(
                        rr.standard_normal((2, h16, w16, 24)), jnp.float32)
                    st = add_j(st, qk, sh, qe, val, st.obj_valid, mcfg, hw)
            assert int(np.asarray(st.long.key_valid.sum())) > 0, (
                "LT consolidation not hit")
            return reads

        single = roll(None)
        shard = roll(pc)
        for i, (a, b) in enumerate(zip(single, shard)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5,
                                       err_msg=f"frame {i}")

    @pytest.mark.slow
    def test_core_step_smoke_with_sharded_memory(self):
        """The flag plumbs through the full inference step (core.step)."""
        import dataclasses

        from vosesam_tpu.inference import core

        h, w = 64, 32
        base = FrameworkConfig(
            xmem=XMemConfig(max_objects=2),
            memory=MemoryConfig(
                max_mid_term_frames=3, min_mid_term_frames=2,
                max_long_term_elements=32, num_prototypes=4, top_k=4,
                mem_every=2, fused_read=False,
            ),
            refinement=RefinementConfig(use_refinement=False),
            dtype="float32",
        )
        sharded = dataclasses.replace(
            base, parallel=ParallelConfig(memory_axis_shards=4))
        xp = xnet.xmem_init(jax.random.PRNGKey(0), base.xmem)
        r = np.random.default_rng(0)
        noise = r.integers(0, 255, (3, h, w, 3), np.uint8)
        mask = jnp.zeros((2, h, w)).at[0, 10:40, 8:24].set(1.0)
        valid = jnp.asarray([True, False])

        probs = {}
        for name, cfg in (("single", base), ("sharded", sharded)):
            st = core.init_tracker_state(cfg, (h, w))
            st, *_ = core.step_with_mask(
                xp, st, jnp.asarray(noise[0]), mask, valid, cfg)
            for i in (1, 2):
                st, prob, _ = core.step(xp, st, jnp.asarray(noise[i]), cfg)
            probs[name] = np.asarray(prob)
        np.testing.assert_allclose(probs["single"], probs["sharded"],
                                   rtol=1e-4, atol=1e-4)


class TestShardedMemoryRead:
    def test_matches_single_device(self, rng):
        """Memory-axis-sharded read over an 8-device CPU mesh == the
        single-device XLA chain, exactly (the gathered-candidate threshold
        is exact)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from vosesam_tpu.ops.memory_attention import read_memory_multiobject
        from vosesam_tpu.parallel.memory_shard import make_sharded_read

        O, M, Q, CK, CV, K = 2, 512, 64, 32, 48, 8
        mk = jnp.asarray(rng.standard_normal((M, CK)).astype(np.float32))
        ms = jnp.asarray(rng.uniform(1, 4, (M,)).astype(np.float32))
        qk = jnp.asarray(rng.standard_normal((Q, CK)).astype(np.float32))
        qe = jnp.asarray(rng.uniform(0, 1, (Q, CK)).astype(np.float32))
        mv = jnp.asarray(rng.standard_normal((O, M, CV)).astype(np.float32))
        kv = jnp.asarray(rng.uniform(0, 1, (M,)) > 0.2)
        vv = jnp.asarray(rng.uniform(0, 1, (O, M)) > 0.3) & kv[None]

        ref_out, ref_use = read_memory_multiobject(
            mk, ms, mv, qk, qe, kv, vv, K, return_usage=True)

        devs = np.asarray(jax.devices()[:8])
        mesh = Mesh(devs, ("mem",))
        read = make_sharded_read(mesh, "mem", K)
        out, use = read(mk, ms, qk, qe, mv, (kv[None] & vv).astype(np.float32) > 0.5)

        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(use), np.asarray(ref_use),
                                   atol=1e-4, rtol=1e-4)


class TestInpaintWindowSharding:
    @pytest.mark.slow
    def test_sharded_windows_match_sequential(self):
        """Inpainter(mesh=...) — one static window per device over `data` —
        must reproduce the sequential static path bit-for-near-bit,
        including a tail group padded by repeating the last window."""
        from jax.sharding import Mesh

        from vosesam_tpu.config import InpainterConfig
        from vosesam_tpu.pipeline.inpaint import Inpainter

        icfg = InpainterConfig(num_blocks=2, static_windows=True)
        seq = Inpainter(cfg=icfg)
        devs = np.asarray(jax.devices()[:4]).reshape(4, 1)
        mesh = Mesh(devs, ("data", "model"))
        shd = Inpainter(cfg=icfg, params=seq.params, mesh=mesh)

        rng = np.random.default_rng(11)
        t = 23  # 5 anchors -> one full group of 4 + a 1-window tail (3 pads)
        frames = [rng.integers(0, 255, (60, 108, 3), np.uint8)
                  for _ in range(t)]
        masks = []
        for _ in range(t):
            m = np.zeros((60, 108), np.uint8)
            m[20:35, 40:70] = 1
            masks.append(m)

        out_seq = seq.inpaint_efficient(frames, masks, dilate_radius=2)
        out_shd = shd.inpaint_efficient(frames, masks, dilate_radius=2)
        for i in range(t):
            np.testing.assert_allclose(
                out_shd[i].astype(np.int32), out_seq[i].astype(np.int32),
                atol=1, err_msg=f"frame {i}")


class TestDataParallelTraining:
    """trainer.train_step's DP contract (trainer.py:144-145): shard the clip
    batch over the mesh `data` axis and jit inserts the gradient all-reduce.
    This pins that the SHARDED step computes the same update as the
    single-placement step — the replacement for the reference's
    never-initialized DDP wrapper (tracker/model/trainer.py:27-29)."""

    def _inputs(self, b):
        rng = np.random.default_rng(3)
        frames = jnp.asarray(
            rng.normal(size=(b, 2, 32, 32, 3)).astype(np.float32))
        gt = np.zeros((b, 2, 32, 32), np.int32)
        for i in range(b):
            gt[i, :, 4 + i : 20 + i, 8:24] = 1
        ov = np.zeros((b, 2), bool)
        ov[:, 0] = True
        return frames, jnp.asarray(gt), jnp.asarray(ov)

    @pytest.mark.slow   # ~50 s: two full train-step compiles (quick-gate
    def test_sharded_step_matches_single_placement(self, mesh):  # budget)
        from vosesam_tpu.training import trainer as T

        cfg = FrameworkConfig(
            xmem=XMemConfig(key_dim=8, value_dim=16, hidden_dim=4,
                            max_objects=2),
            memory=MemoryConfig(top_k=4),
            dtype="float32",
        )
        tcfg = T.TrainConfig(lr=1e-4, seq_length=2)
        params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)
        frames, gt, ov = self._inputs(b=8)

        # single placement (default device, no mesh)
        state0 = T.init_train_state(params, tcfg)
        state_ref, aux_ref = T.train_step(state0, frames, gt, ov, cfg, tcfg)

        # data-parallel: batch sharded over `data`, params/state replicated
        rep = meshlib.replicated(mesh)
        state_dp = jax.tree.map(
            lambda x: jax.device_put(x, rep), T.init_train_state(params, tcfg))
        batch = meshlib.shard_batch((frames, gt, ov), mesh, CFG.parallel)
        state_dp, aux_dp = T.train_step(state_dp, *batch, cfg, tcfg)

        # the per-clip losses are averaged across the batch -> the all-reduced
        # mean gradient; only reduction order may differ (fp tolerance)
        np.testing.assert_allclose(
            float(aux_dp["loss"]), float(aux_ref["loss"]), rtol=1e-5)
        leaves_ref = jax.tree.leaves(state_ref.params)
        leaves_dp = jax.tree.leaves(state_dp.params)
        assert len(leaves_ref) == len(leaves_dp)
        # Adam's first-step update is ~ +-lr * sign(g): a cross-device
        # reduction-order fp difference can flip the sign of a near-zero
        # gradient and move that param by up to 2*lr. atol = 2.5*lr covers
        # exactly that class; anything larger is a real DP divergence.
        for a, b in zip(leaves_ref, leaves_dp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2.5 * tcfg.lr)
        # the updated params must actually have moved
        moved = sum(
            float(np.abs(np.asarray(a) - np.asarray(p)).max())
            for a, p in zip(leaves_ref, jax.tree.leaves(params)))
        assert moved > 0.0
