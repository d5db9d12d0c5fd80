"""Bit-exactness of the DAVIS F-boundary kernel vs the reference's own code.

Imports /root/reference/dataset/errorfunctions.py directly (with a 5-line
skimage shim: disk via the exact skimage grid formula, binary_dilation via
scipy.ndimage) and asserts:
  - seg2bmap bit-equal on a corpus of adversarial masks (edges touching the
    last row/column, empty, full, single pixels, random noise, blobs);
  - db_eval_boundary F equal within 1e-12.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/dataset/errorfunctions.py"


def _load_reference():
    """Load the reference module with skimage.morphology shimmed."""
    from scipy import ndimage

    def disk(radius, dtype=np.uint8):
        # skimage.morphology.disk, verbatim formula.
        L = np.arange(-radius, radius + 1)
        X, Y = np.meshgrid(L, L)
        return np.array((X ** 2 + Y ** 2) <= radius ** 2, dtype=dtype)

    def binary_dilation(image, footprint=None):
        return ndimage.binary_dilation(image.astype(bool), structure=footprint)

    skimage = types.ModuleType("skimage")
    morphology = types.ModuleType("skimage.morphology")
    morphology.disk = disk
    morphology.binary_dilation = binary_dilation
    skimage.morphology = morphology
    saved = {k: sys.modules.get(k) for k in ("skimage", "skimage.morphology")}
    sys.modules["skimage"] = skimage
    sys.modules["skimage.morphology"] = morphology
    try:
        spec = importlib.util.spec_from_file_location("ref_errorfunctions", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference()


def _mask_corpus(rng):
    h, w = 97, 173  # odd, non-multiples — exercises last-row/col rules
    masks = []
    masks.append(np.zeros((h, w), bool))
    masks.append(np.ones((h, w), bool))
    # single pixels at all four corners and center
    for y, x in [(0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1), (h // 2, w // 2)]:
        m = np.zeros((h, w), bool)
        m[y, x] = True
        masks.append(m)
    # stripes touching last row / last column
    m = np.zeros((h, w), bool)
    m[-1, :] = True
    masks.append(m)
    m = np.zeros((h, w), bool)
    m[:, -1] = True
    masks.append(m)
    # random noise at several densities
    for p in (0.02, 0.3, 0.7, 0.98):
        masks.append(rng.random((h, w)) < p)
    # blobs
    yy, xx = np.mgrid[:h, :w]
    for cy, cx, r in [(30, 40, 12), (h - 2, w - 2, 20), (50, 100, 0.5)]:
        masks.append((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)
    return masks


def test_seg2bmap_bit_equal(ref, rng):
    from vosesam_tpu.eval.metrics import seg2bmap

    for m in _mask_corpus(rng):
        ours = seg2bmap(m)
        theirs = ref.seg2bmap(m.copy()).astype(bool)
        assert ours.dtype == bool
        np.testing.assert_array_equal(ours, theirs)


def test_db_eval_boundary_exact(ref, rng):
    from vosesam_tpu.eval.metrics import db_eval_boundary

    masks = _mask_corpus(rng)
    # pair masks: each against a perturbed copy and against another mask
    pairs = []
    for m in masks:
        shifted = np.roll(m, (2, -3), axis=(0, 1))
        pairs.append((m, shifted))
    for a, b in zip(masks[::2], masks[1::2]):
        pairs.append((a, b))

    for fg, gt in pairs:
        ours = db_eval_boundary(fg, gt)
        theirs_f, _, _ = ref.db_eval_boundary(fg.copy(), gt.copy())
        assert abs(ours - float(theirs_f)) < 1e-12


def test_db_eval_boundary_large_bound_th(ref, rng):
    """bound_th >= 1 is taken verbatim as the pixel radius (non-integer)."""
    from vosesam_tpu.eval.metrics import db_eval_boundary

    fg = rng.random((64, 64)) < 0.4
    gt = np.roll(fg, 3, axis=0)
    for th in (1.0, 2.5, 4.0):
        ours = db_eval_boundary(fg, gt, bound_th=th)
        theirs_f, _, _ = ref.db_eval_boundary(fg.copy(), gt.copy(), bound_th=th)
        assert abs(ours - float(theirs_f)) < 1e-12
