"""Prompt-geometry equivalence corridor vs the reference's host algorithms.

The C/CP/CPS redesign (angular-bin boundary sampling for contour-stride/
approxPolyDP, skeleton keypoint top-k for networkx path midpoints, greedy
radius dedup for DBSCAN) is compared against the reference's ACTUAL code
(tracker/base_tracker.py:326-362,:383-412,:482-500, imported from
/root/reference with module shims — scripts/exp_prompt_corridor.py) on a
DAVIS-like mask corpus, two ways:

  1. weight-independent geometry: both sides produce points, all our
     positive points lie ON the object, and the symmetric chamfer distance
     between the point sets stays within a per-algorithm bound;
  2. downstream SAM-mask corridor (slow): reference points -> torch
     transformers.SamModel vs our points -> the JAX predictor with the SAME
     converted weights. Calibration: with random weights the decoder is
     chaotic under ANY prompt perturbation, so the corridor is relative —
     our redesigned points must diverge NO MORE than a +-2 px jitter of the
     reference's own points (the iou_jitter control). Measured 2026-08-19
     (full 12-mask corpus): median iou_geo C/CP/CPS = 0.50/0.57/0.48 vs
     jitter control 0.45/0.50/0.45 — the redesign sits INSIDE sub-pixel
     noise. Numerics contribute zero: iou_full == iou_geo bit-for-bit in
     all 36 rows (the JAX predictor reproduces torch's binary masks
     exactly). Full table: BASELINE.md 'Prompt-geometry corridor'.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")
cv2 = pytest.importorskip("cv2")

from scripts.exp_prompt_corridor import (  # noqa: E402
    chamfer,
    corpus,
    load_reference_prompt_fns,
    our_points,
    run_corridor,
)

# per-algorithm symmetric-chamfer bound (px at 256x256), ~2x the measured
# medians (17.8 / 9.3 / 10.4) — catches a real geometry regression while
# tolerating corpus noise
CHAMFER_BOUND = {"C": 50.0, "CP": 25.0, "CPS": 25.0}

ORACLE_SUBSET = ("ellipse", "two_blobs", "speck", "thin_l", "donut",
                 "crescent", "star", "multi3")


class TestPointGeometry:
    @pytest.fixture(scope="class")
    def ref_fns(self):
        return load_reference_prompt_fns()

    def test_points_exist_inside_and_near_reference(self, ref_fns):
        per_algo = {a: [] for a in ("C", "CP", "CPS")}
        for name, mask in corpus():
            inside = mask > 0
            for algo in per_algo:
                rp = ref_fns[algo](mask.astype(np.uint8))
                op = our_points(mask, algo)
                # both sides agree something is promptable
                assert (len(rp) > 0) == (len(op) > 0), (name, algo)
                # every one of OUR positive points lies ON the object
                xi = np.clip(op[:, 0].astype(int), 0, mask.shape[1] - 1)
                yi = np.clip(op[:, 1].astype(int), 0, mask.shape[0] - 1)
                assert inside[yi, xi].all(), (name, algo)
                per_algo[algo].append(chamfer(rp, op))
        for algo, ds in per_algo.items():
            med = float(np.median([d for d in ds if np.isfinite(d)]))
            assert med <= CHAMFER_BOUND[algo], (algo, med)

    def test_speck_ignored_like_reference(self, ref_fns):
        """Both sides must skip the sub-100px2 component (the reference's
        contourArea cutoff, base_tracker.py:335; our min_region_area)."""
        mask = dict(corpus())["speck"]
        speck_region = np.zeros_like(mask)
        speck_region[25:41, 195:217] = 1   # around the 72 px2 speck
        for algo in ("C", "CP"):
            rp = ref_fns[algo](mask.astype(np.uint8))
            op = our_points(mask, algo)
            for pts, who in ((rp, "ref"), (op, "ours")):
                xi = np.clip(pts[:, 0].astype(int), 0, mask.shape[1] - 1)
                yi = np.clip(pts[:, 1].astype(int), 0, mask.shape[0] - 1)
                assert not speck_region[yi, xi].any(), (algo, who)


@pytest.mark.slow
class TestSamMaskCorridor:
    def test_redesign_within_jitter_corridor(self):
        rows = [r for r in run_corridor() if r["mask"] in ORACLE_SUBSET]
        assert rows, "oracle produced no comparable rows"
        for algo in ("C", "CP", "CPS"):
            sub = [r for r in rows if r["algo"] == algo and "iou_geo" in r]
            assert len(sub) >= 6, (algo, len(sub))
            geo = float(np.median([r["iou_geo"] for r in sub]))
            jit = float(np.median([r["iou_jitter"] for r in sub]))
            # the redesign must not be MORE disruptive than +-2 px jitter of
            # the reference's own points (0.10 margin for median noise on
            # the 8-mask subset)
            assert geo >= jit - 0.10, (algo, geo, jit)
            # numerics identity: same points + converted weights reproduce
            # the torch masks (already pinned by test_reference_parity_sam;
            # here end-to-end through the corridor path)
            for r in sub:
                assert abs(r["iou_full"] - r["iou_geo"]) <= 0.02, r
