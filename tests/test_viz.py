"""Visualization parity pack: exact colormap constant, blur/dim painter
variants, inner-mask debug dumps."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.viz.mask_painter import (
    clipped_signed_distance, fancy_mask_painter,
)
from vosesam_tpu.viz.painter import COLORMAP, mask_painter, paint_indexed


class TestColormap:
    def test_reference_constant(self):
        """Exact values from tools/painter.py:10-103 (spot checks).
        The reference table actually holds 81 rows."""
        assert COLORMAP.shape == (81, 3)
        np.testing.assert_array_equal(COLORMAP[0], [0, 0, 0])
        np.testing.assert_array_equal(COLORMAP[1], [255, 255, 255])
        np.testing.assert_array_equal(
            COLORMAP[2], (np.array([1.000, 0.498, 0.313]) * 255).astype(np.uint8)
        )
        np.testing.assert_array_equal(
            COLORMAP[4], (np.array([0.000, 0.447, 0.741]) * 255).astype(np.uint8)
        )
        np.testing.assert_array_equal(
            COLORMAP[80], (np.array([0.857, 0.857, 0.857]) * 255).astype(np.uint8)
        )

    def test_paint_indexed_uses_label_plus_one(self):
        """base_tracker.py:202: object label o painted with colormap[o+1]."""
        img = np.zeros((16, 16, 3), np.uint8)
        idx = np.zeros((16, 16), np.int32)
        idx[2:14, 2:14] = 1
        out = np.asarray(paint_indexed(jnp.asarray(img), jnp.asarray(idx), 2))
        interior = out[8, 8]  # inside, away from the contour band
        expect = (COLORMAP[2].astype(np.float32) * 0.7).astype(np.uint8)
        assert np.abs(interior.astype(int) - expect.astype(int)).max() <= 1


class TestFancyPainter:
    def test_signed_distance(self):
        m = jnp.zeros((12, 12)).at[4:8, 4:8].set(1.0)
        d = np.asarray(clipped_signed_distance(m, 3.0))
        assert d[5, 5] > 0 and d[0, 0] < 0
        assert d[4, 4] == pytest.approx(1.0)     # corner: 1 px to background
        assert d[3, 4] == pytest.approx(-1.0)    # just outside
        assert d[0, 0] == pytest.approx(-3.0)    # clipped

    @pytest.mark.parametrize("mode", ["00", "01", "10", "11"])
    def test_modes_run(self, mode, rng):
        img = rng.integers(0, 255, (32, 40, 3), np.uint8)
        m = np.zeros((32, 40), np.float32)
        m[8:20, 10:30] = 1.0
        out = np.asarray(fancy_mask_painter(
            jnp.asarray(img), jnp.asarray(m), mode=mode))
        assert out.shape == (32, 40, 3) and out.dtype == np.uint8
        # background darkened (blended toward black) outside the mask
        assert out[0, 0].astype(int).sum() <= img[0, 0].astype(int).sum()

    def test_invalid_args(self):
        img = jnp.zeros((8, 8, 3), jnp.uint8)
        m = jnp.zeros((8, 8))
        with pytest.raises(ValueError):
            fancy_mask_painter(img, m, background_blur_radius=6)
        with pytest.raises(ValueError):
            fancy_mask_painter(img, m, mode="12")


class TestInnerDumps:
    @pytest.mark.slow
    def test_tracker_dumps_inner_masks(self, tmp_path, rng):
        from tests.test_pipeline import tiny_cfg
        from vosesam_tpu.inference.tracker import Tracker
        from vosesam_tpu.models.xmem import network as xnet

        cfg = tiny_cfg(False)
        params = xnet.xmem_init(__import__("jax").random.PRNGKey(0), cfg.xmem)
        t = Tracker(params, None, cfg, paint=False,
                    save_inner_masks_folder=str(tmp_path))
        frame = rng.integers(0, 255, (32, 48, 3), np.uint8)
        template = np.zeros((32, 48), np.uint8)
        template[8:20, 10:26] = 1
        t.track(frame, template)
        t.track(frame)
        t.track(frame)
        d = tmp_path / "inner"
        assert (d / "xmem_masks" / "00001.png").exists()
        assert (d / "refinement_masks" / "00002.png").exists()


class TestDebugPlots:
    def test_plot_helpers_write_files(self, tmp_path, rng):
        from vosesam_tpu.viz.debug_plots import (
            print_by_objects, print_image_bbox, save_masks_side_by_side,
        )

        img = rng.integers(0, 255, (32, 48, 3), np.uint8)
        p1 = str(tmp_path / "bbox.png")
        print_image_bbox(
            img, [(4, 4, 20, 20)],
            pos_points=[np.array([[10.0, 10.0]])],
            neg_points=[np.array([[30.0, 8.0]])],
            save_path=p1,
        )
        masks = np.zeros((2, 32, 48))
        masks[0, 8:20, 8:24] = 1
        coords = np.zeros((2, 4, 2)); coords[0, 0] = [12, 12]
        labels = np.full((2, 4), -1); labels[0, 0] = 1
        p2 = str(tmp_path / "objs.png")
        print_by_objects(masks, coords, labels,
                         obj_valid=np.array([True, False]), save_path=p2)
        p3 = str(tmp_path / "sbs.png")
        save_masks_side_by_side(masks[0], masks[0], p3)
        for p in (p1, p2, p3):
            assert os.path.getsize(p) > 0
