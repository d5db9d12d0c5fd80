"""App session, HTTP server (live end-to-end), automatic masks, RLE."""

import base64
import io
import json
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tests.test_pipeline import fresh_ta, synthetic_video, template, H, W
from vosesam_tpu.eval.rle import decode_rle, encode_rle


@pytest.fixture
def model():
    return fresh_ta(True)


def b64_img(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def b64_mask(arr):
    from vosesam_tpu.eval.palette import pascal_colormap
    img = Image.fromarray(arr.astype(np.uint8), mode="P")
    img.putpalette(pascal_colormap().reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestAppSession:
    def test_click_track_flow(self, model, tmp_path):
        import app as app_mod

        session = app_mod.AppSession(model)
        session.frames = synthetic_video(3)
        session.select_template(0)
        painted = session.click(20, 15, True)
        assert painted.shape == (H, W, 3)
        assert session.current_mask is not None
        assert session.add_mask() == 1
        tm = session.template_mask()
        assert tm.max() == 1
        masks, painted_frames, scores = session.track()
        assert len(masks) == 3
        assert session.remove_mask() == 0

    def test_build_ui_raises_without_gradio(self, model):
        import app as app_mod

        session = app_mod.AppSession(model)
        with pytest.raises(ImportError, match="gradio"):
            app_mod.build_ui(session)


class TestServer:
    def test_live_server_roundtrip(self, model):
        from vosesam_tpu.serve.server import serve

        httpd = serve(model, port=0)   # ephemeral port
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        try:
            with urllib.request.urlopen(f"{base}/health") as r:
                health = json.loads(r.read())
            assert health["status"] == "ok"

            frames = synthetic_video(2)
            req = json.dumps({
                "image": b64_img(frames[0]),
                "points": [[20.0, 15.0]],
                "labels": [1],
            }).encode()
            r = urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/segment", data=req,
                    headers={"Content-Type": "application/json"},
                )
            )
            out = json.loads(r.read())
            assert out["shape"] == [H, W]

            req = json.dumps({
                "frames": [b64_img(f) for f in frames],
                "template_mask": b64_mask(template()),
            }).encode()
            r = urllib.request.urlopen(
                urllib.request.Request(
                    f"{base}/track", data=req,
                    headers={"Content-Type": "application/json"},
                )
            )
            out = json.loads(r.read())
            assert len(out["masks"]) == 2
            m0 = np.array(Image.open(io.BytesIO(base64.b64decode(out["masks"][0]))))
            assert set(np.unique(m0)) <= {0, 3}
        finally:
            httpd.shutdown()

    def test_inpaint_endpoint(self, model):
        import urllib.error

        from vosesam_tpu.config import InpainterConfig
        from vosesam_tpu.pipeline.inpaint import Inpainter
        from vosesam_tpu.serve.server import serve

        httpd = serve(model, port=0)
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        rng = np.random.default_rng(4)
        frames = [rng.integers(0, 255, (60, 108, 3), np.uint8)
                  for _ in range(3)]
        hole = np.zeros((60, 108), np.uint8)
        hole[20:35, 40:70] = 1
        req = json.dumps({
            "frames": [b64_img(f) for f in frames],
            "masks": [b64_mask(hole)] * 3,
            "dilate_radius": 2,
        }).encode()
        post = urllib.request.Request(
            f"{base}/inpaint", data=req,
            headers={"Content-Type": "application/json"})
        try:
            # no inpainter loaded -> 503 with a clear message
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(post)
            assert e.value.code == 503

            model.baseinpainter = Inpainter(
                cfg=InpainterConfig(num_blocks=1, static_windows=True))
            out = json.loads(urllib.request.urlopen(post).read())
            assert len(out["frames"]) == 3
            f0 = np.array(Image.open(io.BytesIO(
                base64.b64decode(out["frames"][0]))))
            assert f0.shape == (60, 108, 3) and f0.dtype == np.uint8
        finally:
            model.baseinpainter = None
            httpd.shutdown()

    def test_two_clients_busy_503(self, model):
        """Single-flight under two concurrent clients: the in-flight /track
        wins; the overlapping request gets an IMMEDIATE 503 + Retry-After
        (not an indefinite queue); a retry after completion succeeds."""
        import threading
        import time
        import urllib.error

        from vosesam_tpu.serve.server import serve

        httpd = serve(model, port=0)
        port = httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        frames = synthetic_video(3)
        req = json.dumps({
            "frames": [b64_img(f) for f in frames],
            "template_mask": b64_mask(template()),
        }).encode()

        def post():
            return urllib.request.urlopen(urllib.request.Request(
                f"{base}/track", data=req,
                headers={"Content-Type": "application/json"}))

        # Deterministic overlap: client A's tracking call (the /track
        # route's default chunked path) blocks ~0.8 s and signals entry,
        # so client B provably overlaps the in-flight call.
        orig_gen = model.generator_chunked
        entered = threading.Event()

        def slow_generator(*a, **k):
            entered.set()
            time.sleep(0.8)
            return orig_gen(*a, **k)

        first = {}

        def client_a():
            r = post()
            first["code"] = r.status

        def wait_lock_free(timeout=5.0):
            # the busy lock releases a scheduling quantum AFTER the client
            # reads its response — a client that fires instantly can race
            # it (that's what Retry-After is for); the test waits it out
            # to keep phase boundaries deterministic
            from vosesam_tpu.serve.server import InferenceHandler
            t0 = time.perf_counter()
            while InferenceHandler.lock.locked():
                assert time.perf_counter() - t0 < timeout, "lock stuck"
                time.sleep(0.01)

        try:
            post()   # warm the jits
            wait_lock_free()
            model.generator_chunked = slow_generator
            th = threading.Thread(target=client_a)
            th.start()
            assert entered.wait(10.0), "client A never reached the model"
            t0 = time.perf_counter()
            with pytest.raises(urllib.error.HTTPError) as e:
                post()
            busy_wall = time.perf_counter() - t0
            th.join()
            assert first["code"] == 200
            assert e.value.code == 503
            assert e.value.headers.get("Retry-After") == "1"
            # the refusal must be immediate, not queued behind A's 0.8 s
            assert busy_wall < 0.5, (
                f"busy reply took {busy_wall:.2f}s — queued, not refused")
            # and a retry after A completes succeeds
            model.generator_chunked = orig_gen
            wait_lock_free()
            assert post().status == 200
        finally:
            # drop the instance-attr shadow, restoring the class method
            # (model is the shared fresh_ta instance)
            try:
                del model.generator_chunked
            except AttributeError:
                pass
            httpd.shutdown()

    def test_unknown_route_404(self, model):
        from vosesam_tpu.serve.server import serve

        httpd = serve(model, port=0)
        port = httpd.server_address[1]
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert e.value.code == 404
        finally:
            httpd.shutdown()


class TestAutomatic:
    def test_generate_masks(self, model):
        from vosesam_tpu.models.sam.automatic import generate_masks

        img = synthetic_video(1)[0]
        out = generate_masks(
            model.sam_params, img, model.cfg.sam,
            points_per_side=4, pred_iou_thresh=-10.0, stability_thresh=0.0,
            batch=4,
        )
        assert out.masks.ndim == 3
        # NMS keeps at least one mask with thresholds wide open
        assert len(out.masks) >= 1
        assert len(out.masks) == len(out.scores) == len(out.points)


class TestRLE:
    def test_roundtrip(self, rng):
        m = (rng.random((13, 17)) > 0.6).astype(np.uint8)
        back = decode_rle(encode_rle(m))
        np.testing.assert_array_equal(back, m)

    def test_empty_and_full(self):
        z = np.zeros((5, 4), np.uint8)
        np.testing.assert_array_equal(decode_rle(encode_rle(z)), z)
        o = np.ones((5, 4), np.uint8)
        np.testing.assert_array_equal(decode_rle(encode_rle(o)), o)

    def test_compressed_counts(self):
        # cocoapi encoding of small masks: verify the varint decoder on a
        # hand-built case — a run of [0-run=3, 1-run=2, 0-run=15] over 4x5
        m = np.zeros((4, 5), np.uint8)
        flat = m.T.reshape(-1)
        flat[3:5] = 1
        m = flat.reshape(5, 4).T
        rle = encode_rle(m)
        assert rle["counts"][0] == 3 and rle["counts"][1] == 2
