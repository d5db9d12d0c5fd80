"""Inference HTTP server.

Reference: text_server.py is a Flask SKELETON whose route bodies are
placeholder comments and which references an undefined ``args`` (:36-58, :68
— non-functional scaffold, SURVEY.md §2.11). This one actually serves, using
only the stdlib (flask isn't in the image):

  GET  /health                 -> {"status": "ok", "backend": ...}
  POST /segment   {"image": b64 png/jpg, "points": [[x,y]...],
                   "labels": [1,0,...]}          -> {"mask": b64 png, "score"}
  POST /track     {"frames": [b64...], "template_mask": b64 indexed png}
                                 -> {"masks": [b64 indexed png ...]}
  POST /inpaint   {"frames": [b64...], "masks": [b64 indexed png ...],
                   "dilate_radius": 15, "ratio": 1.0}
                                 -> {"frames": [b64 png ...]}
                  (503 unless the model was built with an E2FGVI
                  inpainter — TrackingAnything(e2fgvi_checkpoint=...))

Images travel base64; masks come back as palette PNGs.

Concurrency: inference routes are SINGLE-FLIGHT — one model, one device,
one request at a time. A request arriving while another is in flight gets
an immediate ``503 {"error": "busy"}`` with a ``Retry-After`` header
instead of queueing indefinitely behind the lock (two slow /track calls
would otherwise stack wall-clock); clients retry with backoff. /health is
always served."""

from __future__ import annotations

import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
from PIL import Image

from vosesam_tpu.eval.palette import pascal_colormap


def _decode_image(b64: str) -> np.ndarray:
    return np.array(Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB"))


def _decode_mask(b64: str) -> np.ndarray:
    return np.array(Image.open(io.BytesIO(base64.b64decode(b64))).convert("P"))


def _encode_mask(mask: np.ndarray) -> str:
    img = Image.fromarray(mask.astype(np.uint8), mode="P")
    img.putpalette(pascal_colormap().reshape(-1).tolist())
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class InferenceHandler(BaseHTTPRequestHandler):
    model = None          # class attrs injected by serve()
    lock = threading.Lock()

    def _json(self, code: int, payload: dict,
              retry_after: Optional[int] = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if retry_after is not None:
            self.send_header("Retry-After", str(retry_after))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/health":
            import jax

            self._json(200, {"status": "ok", "backend": jax.default_backend()})
        else:
            self._json(404, {"error": "unknown route"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
        except Exception as e:
            self._json(400, {"error": f"bad json: {e}"})
            return

        route = {"/segment": self._segment, "/track": self._track,
                 "/inpaint": self._inpaint}.get(self.path)
        if route is None:
            self._json(404, {"error": "unknown route"})
            return
        # Single-flight: refuse immediately when busy rather than queueing
        # (see module docstring).
        if not self.lock.acquire(blocking=False):
            self._json(503, {"error": "busy: another inference request is "
                             "in flight"}, retry_after=1)
            return
        try:
            route(req)
        except Exception as e:  # surface errors to the client
            self._json(500, {"error": f"{type(e).__name__}: {e}"})
        finally:
            self.lock.release()

    def _segment(self, req: dict) -> None:
        image = _decode_image(req["image"])
        points = np.asarray(req.get("points", []), np.float32).reshape(-1, 2)
        labels = np.asarray(req.get("labels", [1] * len(points)), np.int32)
        self.model.samcontroler.reset_image()
        mask, logit, _ = self.model.first_frame_click(image, points, labels)
        self._json(200, {"mask": _encode_mask(mask.astype(np.uint8)),
                         "shape": list(mask.shape)})

    def _inpaint(self, req: dict) -> None:
        if getattr(self.model, "baseinpainter", None) is None:
            self._json(503, {"error": "inpainter not loaded — start the "
                             "model with e2fgvi_checkpoint=..."})
            return
        frames = [_decode_image(b) for b in req["frames"]]
        masks = [_decode_mask(b) for b in req["masks"]]
        dilate = req.get("dilate_radius")
        out = self.model.baseinpainter.inpaint(
            frames, masks,
            ratio=float(req.get("ratio", 1.0)),
            dilate_radius=None if dilate is None else int(dilate),
        )
        def enc(f):
            buf = io.BytesIO()
            Image.fromarray(np.asarray(f, np.uint8)).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()
        self._json(200, {"frames": [enc(f) for f in out]})

    def _track(self, req: dict) -> None:
        frames = [_decode_image(b) for b in req["frames"]]
        template = _decode_mask(req["template_mask"])
        self.model.xmem.clear_memory()
        # chunked fast path (bit-equal masks, tests/test_chunked.py);
        # "chunk": 0 in the request selects the per-frame generator
        chunk = int(req.get("chunk", 8))
        if chunk > 1:
            masks, scores = self.model.generator_chunked(
                frames, template, chunk=chunk)
        else:
            masks, _logits, _painted, scores = self.model.generator(
                frames, template)
        self._json(200, {
            "masks": [_encode_mask(m) for m in masks],
            "scores": [list(map(float, s)) for s in scores],
        })


def serve(model, host: str = "127.0.0.1", port: int = 6080) -> ThreadingHTTPServer:
    """Start the server (non-blocking; returns the server object)."""
    InferenceHandler.model = model
    httpd = ThreadingHTTPServer((host, port), InferenceHandler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd


def main():
    import argparse

    from vosesam_tpu.config import FrameworkConfig
    from vosesam_tpu.pipeline.track_anything import TrackingAnything

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=6080)
    ap.add_argument("--sam_checkpoint", default=None)
    ap.add_argument("--xmem_checkpoint", default=None)
    args = ap.parse_args()
    model = TrackingAnything(
        sam_checkpoint=args.sam_checkpoint, xmem_checkpoint=args.xmem_checkpoint,
        cfg=FrameworkConfig(),
    )
    httpd = serve(model, port=args.port)
    print(f"serving on :{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
