"""run_parity.py: the one-command J&F parity runner is working code, not a
stub — config 1 executes end-to-end on a synthesized tiny XMem checkpoint +
synthetic DAVIS-2016 tree, and missing artifacts SKIP cleanly."""

import json
import os
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image  # noqa: E402

from tests.test_checkpoint import tree_to_torch_state_dict  # noqa: E402
from vosesam_tpu.config import XMemConfig  # noqa: E402
from vosesam_tpu.eval.palette import save_palette_mask  # noqa: E402
from vosesam_tpu.models.xmem import network as xnet  # noqa: E402


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


def test_config1_runs_end_to_end(tmp_path, monkeypatch):
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

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "run_parity.py", "--checkpoints", str(ck), "--data", str(data),
        "--out", str(out), "--configs", "1",
    ])
    sys.path.insert(0, "/root/repo")
    import run_parity

    run_parity.main()

    with open(out / "parity_report.json") as f:
        rows = json.load(f)
    assert len(rows) == 1
    row = rows[0]
    assert row["config"] == "1_davis2016_bear_xmem_only"
    assert row["J_mean"] is not None and np.isfinite(row["J_mean"])
    assert not row["note"].startswith("SKIP")


def test_synthetic_all_five_end_to_end(tmp_path, monkeypatch):
    """`run_parity.py --synthetic`: every BASELINE config row executes at toy
    scale through the REAL code paths — official-schema .pth checkpoints
    (XMem surgery + SAM/HQ conversion), dataset loaders, runners, report —
    so the harness is proven executable before real artifacts arrive."""
    out = tmp_path / "out"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "run_parity.py", "--synthetic", "--out", str(out),
    ])
    sys.path.insert(0, "/root/repo")
    import run_parity

    run_parity.main()

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
    # LVOS masks written by the runner
    assert os.path.exists("result/parity5_lvos/masks/clip/00000.png")
