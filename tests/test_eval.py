"""Evaluation harness tests: metrics math, dataset layout loaders, runner CSVs."""

import os

import numpy as np
import pytest
from PIL import Image

from vosesam_tpu.eval import metrics as M
from vosesam_tpu.eval.datasets import DavisDataset, LongVideoDataset, unify_masks
from vosesam_tpu.eval.palette import pascal_colormap, save_palette_mask, load_palette_mask


class TestJ:
    def test_iou_exact(self):
        gt = np.zeros((10, 10), np.uint8)
        gt[:5, :5] = 1
        pred = np.zeros((10, 10), np.uint8)
        pred[:5, :4] = 1
        ious = M.calculate_iou(pred, gt)
        assert ious == {1: 20 / 25}

    def test_iou_labels_from_gt(self):
        gt = np.zeros((6, 6), np.uint8)
        gt[0, 0] = 2
        pred = np.zeros((6, 6), np.uint8)
        pred[5, 5] = 9  # label not in GT: ignored
        ious = M.calculate_iou(pred, gt)
        assert set(ious) == {2}
        assert ious[2] == 0.0


class TestF:
    def test_perfect_match(self):
        m = np.zeros((40, 40), np.uint8)
        m[10:30, 10:30] = 1
        assert M.db_eval_boundary(m, m) == 1.0

    def test_shifted_worse_than_exact(self):
        gt = np.zeros((60, 60), np.uint8)
        gt[20:40, 20:40] = 1
        near = np.roll(gt, 1, axis=0)
        far = np.roll(gt, 10, axis=0)
        f_near = M.db_eval_boundary(near, gt)
        f_far = M.db_eval_boundary(far, gt)
        assert f_near > f_far
        assert f_near > 0.9    # 1-px shift within the tolerance band

    def test_empty_cases(self):
        z = np.zeros((20, 20), np.uint8)
        o = np.zeros((20, 20), np.uint8)
        o[5:10, 5:10] = 1
        assert M.db_eval_boundary(z, z) == 1.0
        assert M.db_eval_boundary(o, z) == 0.0
        assert M.db_eval_boundary(z, o) == 0.0


class TestStatistics:
    def test_mean_recall(self):
        v = np.array([1.0, 0.8, 0.6, 0.4, 0.2])
        m, r, d = M.db_statistics(v)
        assert m == pytest.approx(0.6)
        assert r == pytest.approx(3 / 5)

    def test_decay_decreasing_trace(self):
        v = np.linspace(1.0, 0.0, 20)
        _, _, d = M.db_statistics(v)
        assert d > 0.5  # strong decay

    def test_decay_flat(self):
        _, _, d = M.db_statistics(np.full(20, 0.7))
        assert d == pytest.approx(0.0)


class TestAP:
    def test_perfect_predictions(self):
        gt = np.zeros((50, 50), np.uint8)
        gt[:20, :20] = 1
        rows = M.true_positives(gt, gt, {1: 0.99})
        ap = M.calculate_video_AP(rows)
        assert ap["AP"] == pytest.approx(1.0)
        assert ap["AP50"] == pytest.approx(1.0)

    def test_miss_is_zero(self):
        gt = np.zeros((50, 50), np.uint8)
        gt[:20, :20] = 1
        pred = np.zeros_like(gt)
        rows = M.true_positives(pred, gt, {1: 0.9})
        ap = M.calculate_video_AP(rows)
        assert ap["AP"] == 0.0

    def test_area_buckets(self):
        gt = np.zeros((200, 200), np.uint8)
        gt[:5, :5] = 1          # 25 px -> small
        gt[50:150, 50:150] = 2  # 10000 px -> large
        rows = M.true_positives(gt, gt, {1: 0.9, 2: 0.8})
        buckets = {r["label"]: r["area"] for r in rows}
        assert buckets == {1: "small", 2: "large"}


class TestVideoMetrics:
    def test_aggregates(self):
        gt = np.zeros((30, 30), np.uint8)
        gt[5:20, 5:20] = 1
        preds = [gt.copy() for _ in range(5)]
        gts = [gt.copy() for _ in range(5)]
        vm = M.compute_all_video_metrics(preds, gts)
        assert vm["J_mean"] == pytest.approx(1.0)
        assert vm["F_mean"] == pytest.approx(1.0)
        assert vm["JF_mean"] == pytest.approx(1.0)
        assert vm["per_object"][1]["J_mean"] == pytest.approx(1.0)

    def test_sparse_gt_skipped(self):
        gt = np.zeros((30, 30), np.uint8)
        gt[5:20, 5:20] = 1
        preds = [gt.copy() for _ in range(5)]
        gts = [None, gt, None, gt, None]
        vm = M.compute_all_video_metrics(preds, gts)
        assert len(vm["J_trace"]) == 2


def make_davis_layout(root, videos=("bear",), n_frames=3, size=(32, 48)):
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(videos) + "\n")
    rng = np.random.default_rng(0)
    for v in videos:
        img_dir = os.path.join(root, "JPEGImages", "480p", v)
        ann_dir = os.path.join(root, "Annotations", "480p", v)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, size + (3,), np.uint8)
            Image.fromarray(img).save(os.path.join(img_dir, f"{i:05d}.jpg"))
            m = np.zeros(size, np.uint8)
            m[8:20, 10 + i:26 + i] = 1
            save_palette_mask(m, os.path.join(ann_dir, f"{i:05d}.png"))


class TestDatasets:
    def test_davis_layout(self, tmp_path):
        make_davis_layout(str(tmp_path))
        ds = DavisDataset(str(tmp_path), "2017/val.txt")
        assert len(ds) == 1
        info = ds.video_info("bear")
        assert info["num_frames"] == 3 and info["num_objects"] == 1
        fr = ds.load_frame("bear", info["frames"][0])
        assert fr.shape == (32, 48, 3)
        m = ds.load_mask("bear", info["frames"][1])
        assert m.max() == 1

    def test_longvideo_sparse(self, tmp_path):
        root = str(tmp_path / "long")
        os.makedirs(os.path.join(root, "JPEGImages", "clip"), exist_ok=True)
        os.makedirs(os.path.join(root, "Annotations", "clip"), exist_ok=True)
        for i in range(6):
            Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
                os.path.join(root, "JPEGImages", "clip", f"{i:05d}.jpg")
            )
        for i in (0, 3):   # only two annotated frames
            m = np.zeros((16, 16), np.uint8)
            m[4:8, 4:8] = 1
            save_palette_mask(m, os.path.join(root, "Annotations", "clip", f"{i:05d}.png"))
        ds = LongVideoDataset(root)
        info = ds.video_info("clip")
        assert info["test_ids"] == [0, 3]
        assert len(ds.get_all_masks("clip")) == 2

    def test_unify_masks(self):
        a = np.zeros((8, 8)); a[:2] = 1
        b = np.zeros((8, 8)); b[6:] = 1
        u = unify_masks([a, b], [1, 2])
        assert u[0, 0] == 1 and u[7, 0] == 2

    def test_palette_roundtrip(self, tmp_path):
        m = np.zeros((10, 10), np.uint8)
        m[2:5, 3:7] = 3
        p = str(tmp_path / "m.png")
        save_palette_mask(m, p)
        back = load_palette_mask(p)
        np.testing.assert_array_equal(back, m)


class TestRunner:
    def test_davis_runner_end_to_end(self, tmp_path, monkeypatch):
        from tests.test_pipeline import fresh_ta
        from vosesam_tpu.eval.runner import run_model_on_davis_set

        make_davis_layout(str(tmp_path / "davis"), n_frames=3, size=(32, 48))
        monkeypatch.chdir(tmp_path)
        ds = DavisDataset(str(tmp_path / "davis"), "2017/val.txt")
        model = fresh_ta(False)
        df = run_model_on_davis_set("testrun", model, ds, save_masks=True)
        assert len(df) == 1
        assert 0.0 <= df["JF_mean"].iloc[0] <= 1.0
        assert os.path.exists("result/testrun/whole_metrics.csv")
        assert os.path.exists("result/testrun/per_object_metrics.csv")
        assert os.path.exists("result/all_tests.csv")
        assert os.path.exists("result/testrun/masks/bear/00001.png")

    def test_ap_scores_non_contiguous_labels(self):
        """Regression: GT palettes like {0, 3} must read the score of the
        tracker's REMAPPED slot (3 -> slot 1), not padded slot 2 (-inf)."""
        from vosesam_tpu.eval.runner import _eval_one_video
        from vosesam_tpu.utils.mask_mapper import MaskMapper

        gt = np.zeros((24, 24), np.uint8)
        gt[4:16, 4:16] = 3          # single object labeled 3
        frames = [np.zeros((24, 24, 3), np.uint8) for _ in range(3)]
        gts = [gt.copy() for _ in range(3)]

        class FakeTracker:
            def __init__(self):
                self.mapper = MaskMapper()

            def clear_memory(self):
                # runner captures remappings BEFORE this wipes them
                self.mapper.clear()

        class FakeModel:
            def __init__(self):
                self.xmem = FakeTracker()

            def generator(self, frames, template):
                self.xmem.mapper.convert_mask(template)   # 3 -> slot 1
                masks = [template.copy() for _ in frames]
                # slot-ordered scores: slot 1 = 0.9, padded slot 2 = -inf
                scores = [[0.9, -np.inf] for _ in frames]
                return masks, None, frames, scores

        vm = _eval_one_video(FakeModel(), frames, gt, gts)
        # perfect masks with a finite confidence -> AP@0.5 must be 1, and the
        # -inf padded slot must never be associated with label 3
        assert vm["AP50"] == pytest.approx(1.0)
        assert vm["AP"] == pytest.approx(1.0)

    def test_davis_runner_chunk_matches_sequential(self, tmp_path, monkeypatch):
        """The `chunk` fast path wired through run_model_on_davis_set (the
        bench.py headline program routed via generator_chunked) produces
        identical masks and metrics to the per-frame generator — the seam
        between the benched program and the user-facing eval harness."""
        from tests.test_pipeline import fresh_ta
        from vosesam_tpu.eval.runner import run_model_on_davis_set

        make_davis_layout(str(tmp_path / "davis"), n_frames=5, size=(48, 64))
        monkeypatch.chdir(tmp_path)
        ds = DavisDataset(str(tmp_path / "davis"), "2017/val.txt")
        model = fresh_ta(True)   # refinement ON: the production-shaped loop
        df_seq = run_model_on_davis_set("seqrun", model, ds, save_masks=True)
        df_chk = run_model_on_davis_set("chkrun", model, ds, save_masks=True,
                                        chunk=2)
        seq_dir = os.path.join("result", "seqrun", "masks", "bear")
        chk_dir = os.path.join("result", "chkrun", "masks", "bear")
        files = sorted(os.listdir(seq_dir))
        assert files == sorted(os.listdir(chk_dir)) and len(files) == 5
        for f in files:
            np.testing.assert_array_equal(
                load_palette_mask(os.path.join(seq_dir, f)),
                load_palette_mask(os.path.join(chk_dir, f)), err_msg=f)
        for col in ("J_mean", "F_mean", "JF_mean", "AP"):
            np.testing.assert_allclose(df_chk[col], df_seq[col], atol=1e-9,
                                       err_msg=col)

    def test_davis_runner_batched_matches_sequential(self, tmp_path,
                                                     monkeypatch):
        """`batched=` wired through run_model_on_davis_set (mesh-lockstep
        DP x chunked lanes) produces identical masks and J&F/AP metrics to
        the sequential path — the METRIC-bearing runners now reach the
        BatchedGenerator, not just save-only LVOS."""
        import jax
        from jax.sharding import Mesh

        from tests.test_pipeline import fresh_ta
        from vosesam_tpu.eval.runner import run_model_on_davis_set
        from vosesam_tpu.parallel.evaluation import BatchedGenerator

        make_davis_layout(str(tmp_path / "davis"), videos=("bear", "cow"),
                          n_frames=5, size=(48, 64))
        monkeypatch.chdir(tmp_path)
        ds = DavisDataset(str(tmp_path / "davis"), "2017/val.txt")
        model = fresh_ta(False)
        df_seq = run_model_on_davis_set("seqb", model, ds, save_masks=True)
        mesh = Mesh(np.asarray(jax.devices()[:2]),
                    (model.cfg.parallel.data_axis,))
        gen = BatchedGenerator(model.xmem_params, model.sam_params,
                               model.cfg, mesh=mesh, chunk=2)
        df_bat = run_model_on_davis_set("batb", model, ds, save_masks=True,
                                        batched=gen)
        assert list(df_bat["video"]) == list(df_seq["video"])
        for col in ("J_mean", "F_mean", "JF_mean", "AP"):
            np.testing.assert_allclose(df_bat[col], df_seq[col], atol=1e-9,
                                       err_msg=col)
        for v in ("bear", "cow"):
            sdir = os.path.join("result", "seqb", "masks", v)
            bdir = os.path.join("result", "batb", "masks", v)
            files = sorted(os.listdir(sdir))
            assert files == sorted(os.listdir(bdir)) and len(files) == 5
            for f in files:
                np.testing.assert_array_equal(
                    load_palette_mask(os.path.join(sdir, f)),
                    load_palette_mask(os.path.join(bdir, f)),
                    err_msg=f"{v}/{f}")

    def test_longdata_runner_batched_matches_sequential(self, tmp_path,
                                                        monkeypatch):
        """Same for the sparse-GT LongDataset runner (metrics only at
        annotated frame ids)."""
        import jax
        from jax.sharding import Mesh

        from tests.test_pipeline import fresh_ta
        from vosesam_tpu.eval.runner import run_model_on_longdata_set
        from vosesam_tpu.parallel.evaluation import BatchedGenerator

        root = str(tmp_path / "long")
        rng = np.random.default_rng(3)
        for v, n in (("clipA", 6), ("clipB", 4)):   # uneven lengths
            os.makedirs(os.path.join(root, "JPEGImages", v), exist_ok=True)
            os.makedirs(os.path.join(root, "Annotations", v), exist_ok=True)
            for i in range(n):
                img = rng.integers(0, 255, (48, 64, 3), np.uint8)
                img[8 + i:20 + i, 10 + i:26 + i] = [255, 40, 40]
                Image.fromarray(img).save(
                    os.path.join(root, "JPEGImages", v, f"{i:05d}.jpg"))
            for i in (0, n - 1):   # sparse GT: first + last
                m = np.zeros((48, 64), np.uint8)
                m[8 + i:20 + i, 10 + i:26 + i] = 2
                save_palette_mask(
                    m, os.path.join(root, "Annotations", v, f"{i:05d}.png"))
        monkeypatch.chdir(tmp_path)
        ds = LongVideoDataset(root)
        model = fresh_ta(False)
        df_seq = run_model_on_longdata_set("seql", model, ds,
                                           save_masks=True)
        mesh = Mesh(np.asarray(jax.devices()[:2]),
                    (model.cfg.parallel.data_axis,))
        gen = BatchedGenerator(model.xmem_params, model.sam_params,
                               model.cfg, mesh=mesh, chunk=2)
        df_bat = run_model_on_longdata_set("batl", model, ds,
                                           save_masks=True, batched=gen)
        assert list(df_bat["video"]) == list(df_seq["video"])
        for col in ("J_mean", "F_mean", "JF_mean", "AP"):
            np.testing.assert_allclose(df_bat[col], df_seq[col], atol=1e-9,
                                       err_msg=col)


class TestOvis:
    def _make_layout(self, root):
        import json

        from vosesam_tpu.eval.rle import encode_rle

        h, w, n = 32, 48, 3
        os.makedirs(os.path.join(root, "vid_a"), exist_ok=True)
        rng = np.random.default_rng(0)
        fnames = []
        segs1, segs2 = [], []
        for i in range(n):
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            fn = f"vid_a/img_{i:07d}.jpg"
            Image.fromarray(img).save(os.path.join(root, fn))
            fnames.append(fn)
            m1 = np.zeros((h, w), np.uint8)
            m1[8:20, 10 + i:26 + i] = 1
            segs1.append(encode_rle(m1))
            m2 = np.zeros((h, w), np.uint8)
            m2[2:8, 2:10] = 1
            segs2.append(encode_rle(m2) if i < 2 else None)  # vanishes
        data = {
            "videos": [{"id": 7, "file_names": fnames, "height": h, "width": w}],
            "annotations": [
                {"id": 1, "video_id": 7, "segmentations": segs1},
                {"id": 2, "video_id": 7, "segmentations": segs2},
            ],
            "categories": [{"id": 1, "name": "thing"}],
        }
        ann_path = os.path.join(root, "ann.json")
        with open(ann_path, "w") as f:
            json.dump(data, f)
        return ann_path

    def test_ovis_dataset(self, tmp_path):
        from vosesam_tpu.eval.ovis import OvisDataset

        ann = self._make_layout(str(tmp_path))
        ds = OvisDataset(str(tmp_path), ann)
        assert len(ds.videos) == 1
        frames = ds.load_frames(ds.videos[0])
        assert len(frames) == 3 and frames[0].shape == (32, 48, 3)
        gt0 = ds.indexed_gt(ds.videos[0], 0)
        assert set(np.unique(gt0)) == {0, 1, 2}
        gt2 = ds.indexed_gt(ds.videos[0], 2)
        assert set(np.unique(gt2)) == {0, 1}  # object 2 vanished

    def test_ovis_runner_end_to_end(self, tmp_path, monkeypatch):
        from tests.test_pipeline import fresh_ta
        from vosesam_tpu.eval.ovis import OvisDataset, run_model_on_ovis_set

        ann = self._make_layout(str(tmp_path / "ovis"))
        monkeypatch.chdir(tmp_path)
        ds = OvisDataset(str(tmp_path / "ovis"), ann)
        model = fresh_ta(False)
        df = run_model_on_ovis_set("ovisrun", model, ds, save_masks=True)
        assert len(df) == 1
        assert 0.0 <= df["JF_mean"].iloc[0] <= 1.0
        assert os.path.exists("result/ovisrun/whole_metrics.csv")
        assert os.path.exists("result/ovisrun/masks/vid_a/img_0000001.png")
