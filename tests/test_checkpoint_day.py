"""scripts/checkpoint_day.py: the one-command checkpoint-day decision
pipeline runs UNATTENDED end-to-end on official-schema random checkpoints
(VERDICT r4 task 4) — both phases execute through the real run_parity CLI,
the letterbox J&F deltas are computed, and the promote/keep verdict is
emitted. The schema tests prove the checkpoints are convertible; this
proves the DECISION pipeline is executable before real weights arrive."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "tests", ".jax_cache_cpu")


def test_checkpoint_day_synthetic_end_to_end(tmp_path):
    out = tmp_path / "cd"
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "checkpoint_day.py"),
         "--synthetic", "--platform", "cpu", "--chunk", "2",
         "--letterbox", "32x64", "--out", str(out)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=2400)
    assert proc.returncode == 0, (
        f"checkpoint_day failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")

    with open(out / "checkpoint_day_report.json") as f:
        report = json.load(f)

    # both phases ran all their configs, nothing skipped
    assert [r["config"][0] for r in report["official"]] == list("12345")
    assert [r["config"][0] for r in report["letterbox"]] == list("1345")
    for r in report["official"] + report["letterbox"]:
        assert not (r["note"] or "").startswith("SKIP"), r

    # deltas computed on the J&F-bearing configs and a verdict emitted
    deltas = report["letterbox_jf_delta"]
    assert deltas, "no J&F deltas computed"
    for cfg, d in deltas.items():
        assert np.isfinite(d), (cfg, d)
    assert report["letterbox_verdict"] in ("promote", "keep")
    assert "CHECKPOINT-DAY VERDICT" in proc.stdout
    # phase B reused phase A's synthetic artifacts (consistent inputs)
    assert os.path.exists(
        out / "official" / "synthetic" / "checkpoints" / "sam_hq_vit_h.pth")
    assert not os.path.exists(out / "letterbox" / "synthetic")
