"""Interactive Gradio app (reference: app.py, 612 LoC Gradio Blocks UI).

All session logic lives in `AppSession` (plain Python, fully testable without
a UI); `build_ui()` wires it into Gradio Blocks when gradio is installed.
The reference's behaviors are kept: frame extraction with a psutil RAM guard
at 90% (app.py:74-123), template-frame selection re-embedding SAM (:128-147),
click-driven mask refinement (:162-192), multi-mask add/remove (:194-229),
tracking (:232-295), inpainting (:304-331), and mp4 writing (:335-356).
Checkpoint auto-download is path-based only (this environment is zero-egress;
point the env vars at local files)."""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vosesam_tpu.config import FrameworkConfig
from vosesam_tpu.eval.video_io import read_video_frames, write_video
from vosesam_tpu.pipeline.track_anything import TrackingAnything


def get_frames_from_video(path: str, ram_guard: float = 0.9) -> List[np.ndarray]:
    """app.py:74-123: extract frames, stopping at the RAM watermark."""
    try:
        import psutil

        frames = []
        import imageio.v3 as iio

        for fr in iio.imiter(path):
            frames.append(np.asarray(fr))
            if psutil.virtual_memory().percent >= ram_guard * 100:
                break
        return frames
    except Exception:
        return read_video_frames(path)


@dataclass
class AppSession:
    """Session state (video_state/interactive_state/click_state dicts,
    app.py:404-435) plus the callbacks, UI-free."""

    model: TrackingAnything
    frames: List[np.ndarray] = field(default_factory=list)
    template_idx: int = 0
    track_end: Optional[int] = None
    resize_ratio: float = 1.0
    clicks: List[List[float]] = field(default_factory=list)
    click_labels: List[int] = field(default_factory=list)
    masks: List[np.ndarray] = field(default_factory=list)      # saved per-object
    current_mask: Optional[np.ndarray] = None

    # ------------------------------------------------------------ callbacks
    def load_video(self, path: str) -> int:
        self.frames = get_frames_from_video(path)
        self.template_idx = 0
        self.clicks, self.click_labels, self.masks = [], [], []
        return len(self.frames)

    def select_template(self, idx: int) -> np.ndarray:
        """app.py:128-147: re-embed SAM on the chosen frame."""
        self.template_idx = int(idx)
        self.clicks, self.click_labels = [], []
        self.model.samcontroler.reset_image()
        self.model.samcontroler.set_image(self.frames[self.template_idx])
        return self.frames[self.template_idx]

    def click(self, x: float, y: float, positive: bool) -> np.ndarray:
        """sam_refine (app.py:162-192): accumulate clicks, predict."""
        self.clicks.append([float(x), float(y)])
        self.click_labels.append(1 if positive else 0)
        mask, logit, painted = self.model.first_frame_click(
            self.frames[self.template_idx],
            np.asarray(self.clicks, np.float32),
            np.asarray(self.click_labels, np.int32),
        )
        self.current_mask = mask
        return painted

    def add_mask(self) -> int:
        """app.py:194-205 multi-object accumulation."""
        if self.current_mask is not None:
            self.masks.append(self.current_mask.copy())
            self.clicks, self.click_labels = [], []
            self.current_mask = None
        return len(self.masks)

    def remove_mask(self) -> int:
        if self.masks:
            self.masks.pop()
        return len(self.masks)

    def template_mask(self) -> np.ndarray:
        """Merge selected masks into one indexed template (app.py:245-253)."""
        objs = self.masks if self.masks else (
            [self.current_mask] if self.current_mask is not None else []
        )
        if not objs:
            raise ValueError("no masks selected")
        out = np.zeros(objs[0].shape, np.uint8)
        for i, m in enumerate(objs):
            out[m > 0] = i + 1
        return out

    def track(self, output_path: Optional[str] = None):
        """vos_tracking_video (app.py:232-295)."""
        end = self.track_end or len(self.frames)
        frames = self.frames[self.template_idx:end]
        self.model.xmem.clear_memory()
        masks, logits, painted, scores = self.model.generator(
            frames, self.template_mask()
        )
        if output_path:
            write_video(output_path, painted, fps=10)
        return masks, painted, scores

    def inpaint(self, masks: List[np.ndarray], output_path: Optional[str] = None):
        """inpaint_video (app.py:304-331) with OOM-style fallback."""
        if self.model.baseinpainter is None:
            from vosesam_tpu.pipeline.inpaint import Inpainter

            self.model.baseinpainter = Inpainter()
        try:
            out = self.model.baseinpainter.inpaint(
                self.frames, masks, self.resize_ratio
            )
        except Exception:
            out = list(self.frames)   # fallback to originals (app.py:324-328)
        if output_path:
            write_video(output_path, out, fps=10)
        return out


def build_ui(session: AppSession):
    """Gradio Blocks wiring (app.py:483-598). Requires `pip install gradio`
    (not available in this image — the session API above is the tested
    surface)."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed; use AppSession programmatically or "
            "install gradio to launch the UI"
        ) from e

    with gr.Blocks() as demo:
        video_in = gr.Video(label="input video")
        frame_view = gr.Image(label="template frame")
        n_frames = gr.Number(label="frames", precision=0)
        slider = gr.Slider(0, 1, step=1, label="template frame index")
        point_mode = gr.Radio(["positive", "negative"], value="positive")
        add_btn = gr.Button("add mask")
        remove_btn = gr.Button("remove mask")
        track_btn = gr.Button("track")
        video_out = gr.Video(label="tracked")

        def on_video(path):
            n = session.load_video(path)
            return n, gr.update(maximum=max(n - 1, 0))

        video_in.change(on_video, [video_in], [n_frames, slider])
        slider.change(lambda i: session.select_template(int(i)), [slider], [frame_view])

        def on_click(mode, evt: "gr.SelectData"):
            x, y = evt.index
            return session.click(x, y, mode == "positive")

        frame_view.select(on_click, [point_mode], [frame_view])
        add_btn.click(lambda: session.add_mask(), [], [])
        remove_btn.click(lambda: session.remove_mask(), [], [])

        def on_track():
            out = "/tmp/vosesam_track.mp4"
            session.track(out)
            return out

        track_btn.click(on_track, [], [video_out])
    return demo


def main():
    cfg = FrameworkConfig()
    model = TrackingAnything(
        sam_checkpoint=os.environ.get("SAM_CHECKPOINT"),
        xmem_checkpoint=os.environ.get("XMEM_CHECKPOINT"),
        e2fgvi_checkpoint=os.environ.get("E2FGVI_CHECKPOINT"),
        cfg=cfg,
    )
    session = AppSession(model)
    demo = build_ui(session)
    demo.launch(server_port=int(os.environ.get("PORT", 12212)))


if __name__ == "__main__":
    main()
