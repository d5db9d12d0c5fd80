"""Encode-resolution corridor invariant (the letterbox fast gear).

Asserts, at tiny scale (identical fit ratios to production: 0.933 letterbox
fit vs 1.196 official longest-side), the two findings the half-scale run
recorded in BASELINE.md (scripts/exp_encode_corridor.py):

  1. harness sanity: torch-vs-JAX masks at EQUAL geometry agree
     (median IoU >= 0.9 — the numerics column);
  2. corridor invariant: the letterbox geometry's divergence from the
     official square is within the ±2px-prompt-jitter noise floor
     (median iou_letterbox >= median iou_jitter - 0.1).

Random weights — RELATIVE evidence only (see the script's caveat); the gear
stays opt-in until real checkpoints land."""

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")
pytest.importorskip("cv2")


@pytest.mark.slow
def test_letterbox_divergence_within_jitter_noise():
    from scripts.exp_encode_corridor import run_corridor, summarize

    rows = run_corridor("tiny")
    assert len(rows) >= 8
    s = summarize(rows)
    assert s["iou_numerics"] >= 0.9, s
    assert s["iou_letterbox"] >= s["iou_jitter"] - 0.1, s
