"""run_parity.py: the one-command J&F parity runner is working code, not a
stub — config 1 executes end-to-end on a synthesized tiny XMem checkpoint +
synthetic DAVIS-2016 tree, and --synthetic proves all five BASELINE rows.

Each run invokes the REAL CLI in a subprocess (`--platform cpu`): that is
what a user runs, and it isolates these big tracker compiles from the quick
gate's accumulated XLA:CPU compiler state (a late in-process compile after
~200 jits segfaults XLA:CPU on this host — see .claude/skills/verify).
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

# CLI-subprocess integration tests (~150 s combined): slow-gate material —
# the quick gate keeps the in-process parity coverage (test_eval,
# test_chunked, test_batched_runner); the full CLI pipeline also runs in
# tests/test_checkpoint_day.py (slow).
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402

from tests.test_checkpoint import tree_to_torch_state_dict  # noqa: E402
from vosesam_tpu.config import XMemConfig  # noqa: E402
from vosesam_tpu.eval.palette import save_palette_mask  # noqa: E402
from vosesam_tpu.models.xmem import network as xnet  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "tests", ".jax_cache_cpu")


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = CACHE
    # single CPU device is enough; avoid the 8-virtual-device collective
    # rendezvous risk on this 1-core host
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_parity.py"),
         "--platform", "cpu", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (
        f"run_parity failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")


def _make_davis2016(root, n_frames=3, size=(32, 48)):
    os.makedirs(os.path.join(root, "ImageSets", "2016"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "2016", "val.txt"), "w") as f:
        f.write("bear\n")
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "JPEGImages", "480p", "bear")
    ann_dir = os.path.join(root, "Annotations", "480p", "bear")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    for i in range(n_frames):
        img = rng.integers(0, 255, size + (3,), np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.jpg"))
        m = np.zeros(size, np.uint8)
        m[8:20, 10 + i:26 + i] = 1
        save_palette_mask(m, os.path.join(ann_dir, f"{i:05d}.png"))


def test_config1_runs_end_to_end(tmp_path):
    ck = tmp_path / "ck"
    data = tmp_path / "data"
    out = tmp_path / "out"
    ck.mkdir()
    data.mkdir()
    _make_davis2016(str(data / "DAVIS"))

    cfg = XMemConfig(key_dim=8, value_dim=16, hidden_dim=4, max_objects=2)
    params = jax.tree.map(np.asarray, xnet.xmem_init(jax.random.PRNGKey(0), cfg))
    sd = tree_to_torch_state_dict(params)
    sd = {
        (k.replace("key_encoder.layer1.", "key_encoder.res2.")
         if k.startswith("key_encoder.layer1.") else k): v
        for k, v in sd.items()
    }
    torch.save(sd, str(ck / "XMem-s012.pth"))

    _run_cli(["--checkpoints", str(ck), "--data", str(data),
              "--out", str(out), "--configs", "1"], cwd=str(tmp_path))

    with open(out / "parity_report.json") as f:
        rows = json.load(f)
    assert len(rows) == 1
    row = rows[0]
    assert row["config"] == "1_davis2016_bear_xmem_only"
    assert row["J_mean"] is not None and np.isfinite(row["J_mean"])
    assert not row["note"].startswith("SKIP")


@pytest.fixture(scope="module")
def synthetic_seq_run(tmp_path_factory):
    """One sequential `--synthetic` run shared by the tests below (the CLI
    subprocess is the expensive part; its inputs are deterministic)."""
    base = tmp_path_factory.mktemp("parity_seq")
    out = base / "out"
    _run_cli(["--synthetic", "--out", str(out)], cwd=str(base))
    return base, out


def test_synthetic_all_five_end_to_end(synthetic_seq_run):
    """`run_parity.py --synthetic`: every BASELINE config row executes at toy
    scale through the REAL code paths — official-schema .pth checkpoints
    (XMem surgery + SAM/HQ conversion), dataset loaders, runners, report —
    so the harness is proven executable before real artifacts arrive."""
    tmp_path, out = synthetic_seq_run

    with open(out / "parity_report.json") as f:
        rows = json.load(f)
    assert [r["config"] for r in rows] == [
        "1_davis2016_bear_xmem_only", "2_test_sample_full_loop",
        "3_davis2017_val_samhq", "4_longdataset_consolidation", "5_lvos_val",
    ]
    for r in rows:
        assert not (r["note"] or "").startswith("SKIP"), r
    # metric-bearing configs produce finite J&F; 2 is fps-only, 5 masks-only
    for i in (0, 2, 3):
        assert rows[i]["JF_mean"] is not None and np.isfinite(rows[i]["JF_mean"])
    assert rows[1]["fps"] is not None and rows[1]["fps"] > 0
    assert os.path.exists(out / "synthetic" / "checkpoints" / "sam_hq_vit_h.pth")
    # LVOS masks written by the runner (relative to the CLI's cwd)
    assert os.path.exists(
        tmp_path / "result" / "parity5_lvos" / "masks" / "clip" / "00000.png")


def test_synthetic_chunked_and_batched_match_sequential(
        synthetic_seq_run, tmp_path):
    """`run_parity.py --synthetic --chunk 2 --batch` (the measured-fastest
    paths: generator_chunked for configs 1-4, BatchedGenerator for config 5)
    produces the same report metrics and bit-identical saved masks as the
    sequential run — the fast paths users invoke are the audited ones.
    Inputs are deterministic (fixed PRNG seeds in _syn_checkpoints/_syn_data),
    so any mask difference is a real divergence of the fast paths."""
    seq_base, seq_out = synthetic_seq_run
    out = tmp_path / "out"
    _run_cli(["--synthetic", "--out", str(out), "--chunk", "2", "--batch"],
             cwd=str(tmp_path))

    with open(seq_out / "parity_report.json") as f:
        seq_rows = {r["config"]: r for r in json.load(f)}
    with open(out / "parity_report.json") as f:
        fast_rows = {r["config"]: r for r in json.load(f)}
    assert seq_rows.keys() == fast_rows.keys()
    for cfg_name, seq in seq_rows.items():
        fast = fast_rows[cfg_name]
        assert not (fast["note"] or "").startswith("SKIP"), fast
        for col in ("J_mean", "F_mean", "JF_mean"):
            if seq[col] is None:
                assert fast[col] is None, (cfg_name, col)
            else:
                np.testing.assert_allclose(
                    fast[col], seq[col], atol=1e-9,
                    err_msg=f"{cfg_name} {col}")

    from vosesam_tpu.eval.palette import load_palette_mask

    # config 2's saved sample masks and config 5's LVOS palette tree
    for seq_root, fast_root in (
            (seq_out / "sample_masks", out / "sample_masks"),
            (seq_base / "result" / "parity5_lvos" / "masks" / "clip",
             tmp_path / "result" / "parity5_lvos" / "masks" / "clip")):
        files = sorted(os.listdir(seq_root))
        assert files == sorted(os.listdir(fast_root)) and files
        for f in files:
            np.testing.assert_array_equal(
                load_palette_mask(str(seq_root / f)),
                load_palette_mask(str(fast_root / f)),
                err_msg=f"{seq_root}/{f}")
