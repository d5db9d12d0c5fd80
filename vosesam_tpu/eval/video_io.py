"""Host-side video IO (tools/masks_handler.py:34-49, app.py:335-356).

Uses imageio's ffmpeg writer (the reference uses torchvision write_video /
libx264). Gated: raises a clear error when ffmpeg support is unavailable."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def read_video_frames(path: str) -> List[np.ndarray]:
    import imageio.v3 as iio

    # [..., :3]: GIF/PNG-backed clips may decode RGBA; the pipeline is RGB.
    return [np.asarray(f)[..., :3] for f in iio.imiter(path)]


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 10) -> None:
    import imageio

    frames = [
        np.repeat(f[..., None], 3, -1) if f.ndim == 2 else f for f in frames
    ]
    frames = [f.astype(np.uint8) for f in frames]
    try:
        imageio.mimwrite(path, frames, fps=fps, codec="libx264")
    except Exception:
        # ffmpeg plugin unavailable: fall back to GIF next to the target
        imageio.mimwrite(path + ".gif", frames, fps=fps)
