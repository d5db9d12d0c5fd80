"""Deterministic prompt-generation tests on synthetic masks.

The C/CP/CPS algorithms are pure functions of a binary mask (SURVEY.md §4),
so geometric invariants are exactly checkable: centroids inside blobs,
boundary points on the boundary, blob separation, bbox tightness, negative
points from overlapping bboxes, mode composition of the prompt packs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import RefinementConfig
from vosesam_tpu.ops import morphology as morph
from vosesam_tpu.ops import prompts

CFG = RefinementConfig(max_points=16, max_neg_points=8, min_region_area=20.0)


def circle_mask(h=64, w=96, cy=30, cx=40, r=12):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def rect_mask(h=64, w=96, y0=10, y1=30, x0=20, x1=50):
    m = np.zeros((h, w), np.float32)
    m[y0:y1, x0:x1] = 1
    return m


class TestMorphology:
    def test_bbox(self):
        m = rect_mask()
        box, ok = morph.mask_bbox(jnp.array(m))
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(box), [20, 10, 49, 29])

    def test_bbox_empty(self):
        box, ok = morph.mask_bbox(jnp.zeros((8, 8)))
        assert not bool(ok)

    def test_centroid_snap(self):
        # ring mask: centroid falls in the hole, must snap onto the ring
        m = circle_mask(r=12) - circle_mask(r=6)
        c, ok = morph.mask_centroid(jnp.array(m))
        snapped = morph.snap_into_mask(c, jnp.array(m))
        x, y = int(snapped[0]), int(snapped[1])
        assert m[y, x] == 1

    def test_boundary_is_thin(self):
        m = jnp.array(circle_mask())
        b = morph.boundary(m)
        assert 0 < int(jnp.sum(b)) < int(jnp.sum(m))
        # boundary pixels all belong to the mask
        assert bool(jnp.all(~b | m.astype(bool)))

    def test_blob_labeling_separates(self):
        m = rect_mask() + rect_mask(y0=40, y1=60, x0=60, x1=90)
        blobs, valid = morph.top_blobs(jnp.array(m), 4, 20.0, downsample=1)
        assert int(valid.sum()) == 2
        areas = np.asarray(jnp.sum(blobs, (1, 2)))
        assert set(areas[np.asarray(valid)]) == {20 * 30, 20 * 30}
        # blobs are disjoint
        assert int(jnp.sum(blobs[0] & blobs[1])) == 0

    def test_blob_min_area(self):
        m = rect_mask() + rect_mask(y0=50, y1=53, x0=80, x1=83)  # 9 px blob
        blobs, valid = morph.top_blobs(jnp.array(m), 4, 20.0, downsample=1)
        assert int(valid.sum()) == 1

    def test_downsampled_labeling(self):
        m = rect_mask(y0=8, y1=32, x0=16, x1=48) + rect_mask(y0=40, y1=60, x0=60, x1=92)
        blobs, valid = morph.top_blobs(jnp.array(m), 4, 20.0, downsample=4)
        assert int(valid.sum()) == 2

    def test_angular_points_on_boundary(self):
        m = jnp.array(circle_mask())
        c, _ = morph.mask_centroid(m)
        pts, valid = morph.angular_boundary_points(m, c, 8)
        assert int(valid.sum()) == 8
        b = np.asarray(morph.boundary(m))
        for x, y in np.asarray(pts)[np.asarray(valid)]:
            assert b[int(y), int(x)]
        # radii roughly equal to the circle radius
        r = np.hypot(np.asarray(pts)[:, 0] - 40, np.asarray(pts)[:, 1] - 30)
        assert np.all(np.abs(r - 12) < 3)

    def test_skeleton_of_bar(self):
        m = jnp.array(rect_mask(y0=30, y1=37, x0=10, x1=80))
        sk = morph.skeletonize(m, 16)
        n = int(jnp.sum(sk))
        assert 0 < n <= 80                  # thin line-ish
        ys = np.where(np.asarray(sk))[0]
        assert np.all(np.abs(ys - 33) <= 2)  # near the bar's center row
        ep, br = morph.skeleton_keypoints(sk)
        assert int(jnp.sum(ep)) >= 2        # two endpoints

    def test_dedup(self):
        pts = jnp.array([[0.0, 0], [1, 1], [10, 10], [11, 10], [30, 30]])
        valid = jnp.ones(5, bool)
        keep = morph.dedup_points(pts, valid, 5.0)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True, False, True])


class TestPointAlgorithms:
    @pytest.mark.parametrize("algo", ["C", "CP", "CPS"])
    def test_points_inside_or_on_mask(self, algo):
        cfg = RefinementConfig(point_algorithm=algo, min_region_area=20.0)
        m = jnp.array(circle_mask())
        ps = prompts.generate_points(m, cfg)
        pts = np.asarray(ps.coords)[np.asarray(ps.valid)]
        assert len(pts) >= 3
        mm = np.asarray(morph.dilate(m, 1))
        for x, y in pts:
            assert mm[int(y), int(x)], (x, y)

    def test_two_blobs_covered(self):
        cfg = RefinementConfig(point_algorithm="C", min_region_area=20.0)
        m = jnp.array(rect_mask() + rect_mask(y0=40, y1=60, x0=60, x1=90))
        ps = prompts.generate_points(m, cfg)
        pts = np.asarray(ps.coords)[np.asarray(ps.valid)]
        in_a = [(20 <= x < 50 and 10 <= y < 30) for x, y in pts]
        in_b = [(60 <= x < 90 and 40 <= y < 60) for x, y in pts]
        assert any(in_a) and any(in_b)

    def test_empty_mask_no_points(self):
        cfg = RefinementConfig(point_algorithm="C", min_region_area=20.0)
        ps = prompts.generate_points(jnp.zeros((64, 96)), cfg)
        assert int(ps.valid.sum()) == 0


class TestNegativePoints:
    def test_neighbor_points_become_negatives(self):
        # object 0 box overlaps object 1's points
        pts = jnp.array([
            [[30.0, 20.0], [40.0, 25.0]],     # object 0 positives
            [[45.0, 22.0], [80.0, 50.0]],     # object 1 positives
        ])
        valid = jnp.ones((2, 2), bool)
        boxes = jnp.array([[20.0, 10, 50, 30], [40.0, 15, 90, 60]])
        bok = jnp.ones(2, bool)
        neg, nok = prompts.negative_points(pts, valid, boxes, bok, 4)
        # object 0: object-1 point (45,22) lies inside its box
        got = np.asarray(neg[0])[np.asarray(nok[0])]
        assert [45.0, 22.0] in got.tolist()
        assert [80.0, 50.0] not in got.tolist()
        # object 1: object-0 points (40,25) inside its box; (30,20) not
        got1 = np.asarray(neg[1])[np.asarray(nok[1])]
        assert [40.0, 25.0] in got1.tolist()
        assert [30.0, 20.0] not in got1.tolist()


class TestPromptPacks:
    def setup_method(self):
        self.masks = jnp.stack([
            jnp.array(circle_mask()),
            jnp.array(rect_mask(y0=40, y1=60, x0=60, x1=90)),
            jnp.zeros((64, 96)),
        ])
        self.valid = jnp.array([True, True, False])

    @pytest.mark.parametrize("mode,want_box,want_pos,want_neg,want_mask", [
        ("bbox", True, False, False, False),
        ("point", False, True, False, False),
        ("both", True, True, False, False),
        ("both_neg", True, True, True, False),
        ("mask", False, False, False, True),
        ("mask_bbox", True, False, False, True),
        ("mask_pos", False, True, False, True),
        ("mask_bbox_pos", True, True, False, True),
        ("mask_bbox_neg", True, False, True, True),
        ("mask_bbox_pos_neg", True, True, True, True),
    ])
    def test_mode_composition(self, mode, want_box, want_pos, want_neg, want_mask):
        cfg = RefinementConfig(mode=mode, min_region_area=20.0)
        pack = prompts.build_prompt_pack(mode, self.masks, self.valid, cfg)
        labels0 = np.asarray(pack.labels[0])
        assert pack.use_mask == want_mask
        assert ((labels0 == 2).any() and (labels0 == 3).any()) == want_box
        assert (labels0 == 1).any() == want_pos
        # invalid object: all padding
        assert np.all(np.asarray(pack.labels[2]) == -1)
        assert not bool(pack.has_prompt[2])
        assert bool(pack.has_prompt[0])

    def test_jit_and_vmap_compatible(self):
        cfg = RefinementConfig(mode="both_neg", min_region_area=20.0)
        pack = jax.jit(
            lambda m, v: prompts.build_prompt_pack("both_neg", m, v, cfg)
        )(self.masks, self.valid)
        assert pack.coords.shape[0] == 3
