"""Flow visualization (viz/flow.py) + flow completion loss (e2fgvi/losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.viz import flow as fviz


class TestColorwheel:
    def test_shape_and_arcs(self):
        wheel = fviz.make_colorwheel()
        assert wheel.shape == (55, 3)
        # arc boundaries per Baker et al.: RY starts fully red,
        # YG region ends fully green, BM region is blue-saturated
        np.testing.assert_array_equal(wheel[0], [255, 0, 0])
        np.testing.assert_array_equal(wheel[21], [0, 255, 0])  # after RY+YG
        assert (wheel[25:49, 2] == 255).all()  # CB+BM blue saturation
        assert wheel.min() >= 0 and wheel.max() == 255

    def test_wraparound_continuity(self):
        wheel = fviz.make_colorwheel()
        # last MR entry ramps back toward row 0 (red): B nearly 0, R 255
        assert wheel[-1, 0] == 255
        assert wheel[-1, 2] <= 255 / 6 + 1


class TestFlowToImage:
    def test_zero_flow_is_white(self):
        img = fviz.flow_to_image(np.zeros((8, 10, 2), np.float32))
        assert img.shape == (8, 10, 3) and img.dtype == np.uint8
        # rad=0 -> col=1 -> floor(255*1)=255 everywhere
        assert (img == 255).all()

    def test_direction_hues_differ(self):
        f = np.zeros((2, 2, 2), np.float32)
        f[0, 0] = (1, 0)
        f[0, 1] = (-1, 0)
        f[1, 0] = (0, 1)
        f[1, 1] = (0, -1)
        img = fviz.flow_to_image(f)
        pix = {tuple(img[i, j]) for i in range(2) for j in range(2)}
        assert len(pix) == 4  # four directions, four distinct colors

    def test_magnitude_normalization(self):
        f = np.zeros((1, 2, 2), np.float32)
        f[0, 0] = (5, 0)
        f[0, 1] = (10, 0)    # max radius; scales both
        img = fviz.flow_to_image(f)
        # the larger flow is more saturated (farther from white)
        assert int(img[0, 1].min()) < int(img[0, 0].min())

    def test_bgr_flag_reverses_channels(self):
        f = np.ones((3, 3, 2), np.float32)
        rgb = fviz.flow_to_image(f)
        bgr = fviz.flow_to_image(f, convert_to_bgr=True)
        np.testing.assert_array_equal(rgb[..., ::-1], bgr)

    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError):
            fviz.flow_to_image(np.zeros((4, 4, 3), np.float32))


class TestFlowCompletionLoss:
    def test_zero_at_gt_and_positive_off_gt(self):
        from vosesam_tpu.models.e2fgvi import losses as L
        from vosesam_tpu.models.e2fgvi import modules as M

        spy = M.spynet_init(jax.random.PRNGKey(0))
        frames = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        gt = jax.jit(L._quarter_flows)(spy, frames)
        z = jnp.zeros_like(gt[0])
        loss_fn = jax.jit(L.flow_completion_loss)
        loss_at_gt = loss_fn(spy, gt, frames)
        loss_off = loss_fn(spy, (z, z), frames)
        assert float(loss_at_gt) == pytest.approx(0.0, abs=1e-6)
        assert float(loss_off) >= float(loss_at_gt)
        assert np.isfinite(float(loss_off))

    def test_differentiable_wrt_pred(self):
        from vosesam_tpu.models.e2fgvi import losses as L
        from vosesam_tpu.models.e2fgvi import modules as M

        spy = M.spynet_init(jax.random.PRNGKey(0))
        frames = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        shape = (1, 8, 8, 2)
        pred = (jnp.ones(shape), jnp.ones(shape))
        g = jax.jit(jax.grad(
            lambda p: L.flow_completion_loss(spy, p, frames)
        ))(pred)
        assert all(np.isfinite(np.asarray(x)).all() for x in g)
