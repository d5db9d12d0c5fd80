"""scripts/checkpoint_day.py: the one-command checkpoint-day decision
pipeline runs UNATTENDED end-to-end on official-schema random checkpoints
(VERDICT r4 task 4) — both phases execute through the real run_parity CLI,
the letterbox J&F deltas are computed, and the promote/keep verdict is
emitted. The schema tests prove the checkpoints are convertible; this
proves the DECISION pipeline is executable before real weights arrive."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "tests", ".jax_cache_cpu")


def _load_cd():
    spec = importlib.util.spec_from_file_location(
        "checkpoint_day", os.path.join(REPO, "scripts", "checkpoint_day.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rows(**jf):
    return [{"config": c, "JF_mean": v} for c, v in jf.items()]


class TestVerdictLogic:
    """compute_verdict, pure (the subprocess test only reaches the
    complete-comparison path)."""

    def test_promote_when_all_within_gate(self):
        cd = _load_cd()
        off = _rows(**{c: 0.80 for c in cd.JF_CONFIGS})
        lb = _rows(**{c: 0.75 for c in cd.JF_CONFIGS})
        v = cd.compute_verdict(off, lb, 0.2)
        assert v["verdict"] == "promote" and not v["incomplete"]
        assert all(abs(d + 0.05) < 1e-9 for d in v["deltas"].values())

    def test_keep_when_any_delta_exceeds_gate(self):
        cd = _load_cd()
        off = _rows(**{c: 0.80 for c in cd.JF_CONFIGS})
        lb = _rows(**{c: (0.50 if c == cd.JF_CONFIGS[0] else 0.79)
                      for c in cd.JF_CONFIGS})
        assert cd.compute_verdict(off, lb, 0.2)["verdict"] == "keep"

    def test_keep_when_comparison_incomplete(self):
        """A config with J&F in only ONE phase forces 'keep' even when
        every computed delta passes — never promote on partial data."""
        cd = _load_cd()
        off = _rows(**{c: 0.80 for c in cd.JF_CONFIGS})
        lb = _rows(**{c: 0.80 for c in cd.JF_CONFIGS[:2]})  # 2 missing
        v = cd.compute_verdict(off, lb, 0.2)
        assert v["verdict"] == "keep"
        assert set(v["incomplete"]) == set(cd.JF_CONFIGS[2:])

    def test_excluded_configs_do_not_block_promotion(self):
        """Absent from BOTH phases (dataset not downloaded) = excluded,
        not incomplete; the remaining complete comparison can promote."""
        cd = _load_cd()
        both = cd.JF_CONFIGS[:2]
        off, lb = _rows(**{c: 0.8 for c in both}), _rows(**{c: 0.8 for c in both})
        v = cd.compute_verdict(off, lb, 0.2)
        assert v["verdict"] == "promote"
        assert set(v["excluded"]) == set(cd.JF_CONFIGS[2:])

    def test_keep_when_nothing_compared(self):
        cd = _load_cd()
        assert cd.compute_verdict([], [], 0.2)["verdict"] == "keep"


@pytest.mark.slow
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
