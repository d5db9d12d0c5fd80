"""Native async JPEG loader: build, decode parity vs PIL, ordering, errors."""

import os

import numpy as np
import pytest
from PIL import Image

from vosesam_tpu.utils import native_loader as NL


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        # smooth-ish image so JPEG round-trip is predictable
        base = rng.integers(0, 255, (4, 6, 3), np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((96, 64), Image.BILINEAR)
        )
        p = str(d / f"{i:05d}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_builds():
    assert NL.native_available(), "g++/libjpeg expected in this image"


def test_decode_matches_pil(jpeg_dir):
    frames = NL.load_frames(jpeg_dir, threads=3, depth=4)
    assert len(frames) == 12
    for p, f in zip(jpeg_dir, frames):
        want = np.array(Image.open(p).convert("RGB"))
        assert f.shape == want.shape == (64, 96, 3)
        # same libjpeg underneath: expect (near-)identical pixels
        assert np.mean(np.abs(f.astype(int) - want.astype(int))) < 1.0


def test_in_order_streaming(jpeg_dir):
    loader = NL.AsyncFrameLoader(jpeg_dir, threads=4, depth=2)
    shapes = [f.shape for f in loader]
    loader.close()
    assert len(shapes) == 12


def test_decode_error_raises(tmp_path, jpeg_dir):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    loader = NL.AsyncFrameLoader([jpeg_dir[0], bad], threads=1, depth=2)
    it = iter(loader)
    next(it)
    with pytest.raises(IOError):
        next(it)
    loader.close()
