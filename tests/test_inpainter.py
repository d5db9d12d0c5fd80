"""E2FGVI inpainter tests: module numerics vs torch (fold/unfold/flow_warp),
generator shapes, windowing driver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vosesam_tpu.config import InpainterConfig  # noqa: E402
from vosesam_tpu.models.e2fgvi import generator as G  # noqa: E402
from vosesam_tpu.models.e2fgvi import modules as M  # noqa: E402
from vosesam_tpu.pipeline.inpaint import Inpainter, get_ref_index  # noqa: E402

CFG = InpainterConfig(num_blocks=2)


class TestUnfoldFold:
    def test_unfold_matches_torch(self, rng):
        x = rng.normal(size=(2, 12, 15, 4)).astype(np.float32)
        got = np.asarray(M.unfold(jnp.array(x), (7, 7), (3, 3), (3, 3)))
        want = torch.nn.functional.unfold(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            kernel_size=7, stride=3, padding=3,
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_fold_matches_torch(self, rng):
        x = rng.normal(size=(2, 20, 4 * 49)).astype(np.float32)
        got = np.asarray(M.fold(jnp.array(x), (12, 15), (7, 7), (3, 3), (3, 3)))
        want = torch.nn.functional.fold(
            torch.from_numpy(np.transpose(x, (0, 2, 1))),
            output_size=(12, 15), kernel_size=7, stride=3, padding=3,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_fold_unfold_normalization_identity(self, rng):
        # fold(unfold(x)) / fold(unfold(ones)) == x
        x = rng.normal(size=(1, 12, 15, 3)).astype(np.float32)
        u = M.unfold(jnp.array(x), (7, 7), (3, 3), (3, 3))
        ones = M.unfold(jnp.ones_like(jnp.array(x)), (7, 7), (3, 3), (3, 3))
        f = M.fold(u, (12, 15), (7, 7), (3, 3), (3, 3))
        n = M.fold(ones, (12, 15), (7, 7), (3, 3), (3, 3))
        np.testing.assert_allclose(np.asarray(f / n), x, rtol=1e-4, atol=1e-5)


class TestFlowWarp:
    def test_matches_torch_grid_sample(self, rng):
        x = rng.normal(size=(2, 10, 14, 3)).astype(np.float32)
        flow = (rng.normal(size=(2, 10, 14, 2)) * 2).astype(np.float32)
        got = np.asarray(M.flow_warp(jnp.array(x), jnp.array(flow)))

        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ft = torch.from_numpy(flow)
        h, w = 10, 14
        gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack((gx, gy), 2).float()
        gf = grid[None] + ft
        gfx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
        gfy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
        want = torch.nn.functional.grid_sample(
            xt, torch.stack((gfx, gfy), 3), mode="bilinear",
            padding_mode="zeros", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_zero_flow_identity(self, rng):
        x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
        out = np.asarray(M.flow_warp(jnp.array(x), jnp.zeros((1, 8, 8, 2))))
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestSPyNet:
    def test_flow_shapes(self):
        params = M.spynet_init(jax.random.PRNGKey(0))
        ref = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 96, 3))
        supp = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 96, 3))
        flow = jax.jit(M.spynet_flow)(params, ref, supp)
        assert flow.shape == (2, 64, 96, 2)
        assert np.isfinite(np.asarray(flow)).all()


class TestDeformConv:
    def test_zero_offset_equals_conv(self, rng):
        # with zero offsets and mask=1, modulated deform conv == plain conv
        x = rng.normal(size=(1, 8, 10, 32)).astype(np.float32)
        wt = rng.normal(size=(3, 3, 32, 16)).astype(np.float32) * 0.1
        g = 16
        offset = np.zeros((1, 8, 10, 2 * g * 9), np.float32)
        mask = np.ones((1, 8, 10, g * 9), np.float32)
        got = np.asarray(M.modulated_deform_conv(
            jnp.array(x), jnp.array(offset), jnp.array(mask),
            jnp.array(wt), None, g,
        ))
        from vosesam_tpu.models.layers import conv2d
        want = np.asarray(conv2d(jnp.array(x), {"weight": jnp.array(wt)}, padding=1))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestGenerator:
    def test_forward_shapes(self):
        params = G.generator_init(jax.random.PRNGKey(0), CFG)
        frames = jax.random.uniform(jax.random.PRNGKey(1), (5, 60, 108, 3)) * 2 - 1
        fwd = jax.jit(lambda p, f: G.generator_forward(
            p, f, num_local=3, cfg=CFG))
        out, (ff, fb) = fwd(params, frames)
        assert out.shape == (5, 60, 108, 3)
        assert ff.shape == (2, 15, 27, 2)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert o.min() >= -1.0 and o.max() <= 1.0  # tanh


class TestDriver:
    def test_ref_index(self):
        ids = get_ref_index(0, [0, 1, 2], 30, -1, 10)
        assert ids == [10, 20]

    def test_static_window_plan_constant_signature(self):
        from vosesam_tpu.pipeline.inpaint import (
            static_ref_budget, static_window_plan,
        )

        for t in (12, 28, 54, 99):
            r = static_ref_budget(t, 5, 10)
            sigs = set()
            for f in range(0, t, 5):
                ids, nl, n_valid, writes = static_window_plan(f, t, 5, 10, r)
                sigs.add((len(ids), nl))
                assert n_valid <= len(ids)
                assert set(writes) <= set(ids[:nl])
                # interior anchors carry exactly the reference's window
                ref_nb = list(range(max(0, f - 5), min(t, f + 6)))
                if len(ref_nb) == min(t, 11) and ids[:nl] == ref_nb:
                    ref_refs = get_ref_index(f, ref_nb, t, -1, 10)
                    assert ids[nl:nl + len(ref_refs)] == ref_refs
            assert len(sigs) == 1, (t, sigs)

    @pytest.mark.slow
    def test_static_windows_match_variable_on_interior_frames(self):
        """The static-shape window path (one jit signature) must reproduce
        the variable-length reference path bit-for-near-bit on every frame
        whose contributing windows are interior (masked pad frames carry
        exactly zero attention weight)."""
        import dataclasses

        inp_var = Inpainter(cfg=dataclasses.replace(CFG, static_windows=False))
        inp_st = Inpainter(cfg=dataclasses.replace(CFG, static_windows=True),
                           params=inp_var.params)
        rng = np.random.default_rng(3)
        t = 28
        frames = [rng.integers(0, 255, (60, 108, 3), np.uint8)
                  for _ in range(t)]
        masks = []
        for _ in range(t):
            m = np.zeros((60, 108), np.uint8)
            m[20:35, 40:70] = 1
            masks.append(m)
        out_var = inp_var.inpaint_efficient(frames, masks, dilate_radius=2)
        out_st = inp_st.inpaint_efficient(frames, masks, dilate_radius=2)
        # anchors 0 and 25 are edge windows (extra clamped context by
        # design); frames 6..19 are written only by interior anchors
        for i in range(6, 20):
            np.testing.assert_allclose(
                out_st[i].astype(np.int32), out_var[i].astype(np.int32),
                atol=1,
                err_msg=f"frame {i}")

    @pytest.mark.slow
    def test_window_batch_matches_sequential(self):
        """window_batch > 1 (B static windows vmapped through one generator
        call) must reproduce the sequential static path bit-for-near-bit —
        including the tail group, which pads by repeating the last window."""
        import dataclasses

        inp_seq = Inpainter(cfg=dataclasses.replace(CFG, static_windows=True))
        inp_b = Inpainter(
            cfg=dataclasses.replace(CFG, static_windows=True, window_batch=2),
            params=inp_seq.params)
        rng = np.random.default_rng(7)
        t = 28  # 6 anchors -> 3 groups of 2 at B=2; t=33 below tests a tail
        for t in (28, 33):
            frames = [rng.integers(0, 255, (60, 108, 3), np.uint8)
                      for _ in range(t)]
            masks = []
            for _ in range(t):
                m = np.zeros((60, 108), np.uint8)
                m[20:35, 40:70] = 1
                masks.append(m)
            out_seq = inp_seq.inpaint_efficient(frames, masks, dilate_radius=2)
            out_b = inp_b.inpaint_efficient(frames, masks, dilate_radius=2)
            for i in range(t):
                np.testing.assert_allclose(
                    out_b[i].astype(np.int32), out_seq[i].astype(np.int32),
                    atol=1, err_msg=f"t={t} frame {i}")

    @pytest.mark.slow
    def test_device_composite_matches_host(self):
        """InpainterConfig.device_composite (the default: once-uploaded
        video, in-jit window gather, jitted masked-composite + 50/50 blend,
        one uint8 download) must reproduce the host-compositing
        reference-shaped path on every frame — static AND variable window
        regimes, with a downscale ratio in the mix."""
        import dataclasses

        inp_dev = Inpainter(cfg=dataclasses.replace(
            CFG, static_windows=True, device_composite=True))
        inp_host = Inpainter(cfg=dataclasses.replace(
            CFG, static_windows=True, device_composite=False),
            params=inp_dev.params)
        rng = np.random.default_rng(5)
        for t, ratio in ((28, 1.0), (6, 1.0), (16, 0.5)):
            hw = (60, 108) if ratio == 1.0 else (120, 216)
            frames = [rng.integers(0, 255, hw + (3,), np.uint8)
                      for _ in range(t)]
            masks = []
            for _ in range(t):
                m = np.zeros(hw, np.uint8)
                m[20:35, 40:70] = 1
                masks.append(m)
            out_d = inp_dev.inpaint_efficient(frames, masks, ratio=ratio,
                                              dilate_radius=2)
            out_h = inp_host.inpaint_efficient(frames, masks, ratio=ratio,
                                               dilate_radius=2)
            assert len(out_d) == len(out_h) == t
            # Platform-independent invariant: OUTSIDE the dilated mask both
            # paths are the pure img passthrough -> must be bit-exact on any
            # backend. Inside the mask the generator's warp-floor
            # discontinuities can amplify compile-fusion fp noise under
            # random weights (measured on TPU: 4.5% of inpainted pixels,
            # BASELINE.md), so the tight atol holds only where the CPU
            # backend's fusions stay within rounding — which this CPU-pinned
            # suite asserts below.
            from vosesam_tpu.pipeline.inpaint import _dilate_n

            dil = np.asarray(_dilate_n(jnp.asarray(
                np.stack([m > 0 for m in masks]), jnp.float32), 2)) > 0
            if ratio != 1.0:
                import jax as _jax
                dil = np.asarray(_jax.image.resize(
                    jnp.asarray(dil, jnp.float32),
                    (t, out_d[0].shape[0], out_d[0].shape[1]),
                    "nearest")) > 0
            for i in range(t):
                d = np.abs(out_d[i].astype(np.int32)
                           - out_h[i].astype(np.int32)).max(-1)
                assert d[~dil[i]].max() == 0, (
                    f"t={t} ratio={ratio} frame {i}: device/host differ "
                    "OUTSIDE the mask — compositing logic broken")
                np.testing.assert_array_less(
                    d, 2, err_msg=f"t={t} ratio={ratio} frame {i}")

    @pytest.mark.slow
    def test_inpaint_small_video(self):
        inp = Inpainter(cfg=CFG)
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (60, 108, 3), np.uint8) for _ in range(6)]
        masks = []
        for _ in range(6):
            m = np.zeros((60, 108), np.uint8)
            m[20:35, 40:70] = 1
            masks.append(m)
        out = inp.inpaint_efficient(frames, masks, dilate_radius=2)
        assert len(out) == 6
        assert out[0].shape == (60, 108, 3) and out[0].dtype == np.uint8
        # unmasked pixels keep the original content
        np.testing.assert_array_equal(out[0][:10, :10], frames[0][:10, :10])
