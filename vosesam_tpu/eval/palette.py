"""DAVIS palette PNG IO (davisImpaiting/davisBaseImpainter.py:127-132)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def pascal_colormap(n: int = 256) -> np.ndarray:
    """Standard PASCAL VOC colormap (bit-reversal construction)."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def save_palette_mask(mask: np.ndarray, path: str) -> None:
    img = Image.fromarray(mask.astype(np.uint8), mode="P")
    img.putpalette(pascal_colormap().reshape(-1).tolist())
    img.save(path)


def load_palette_mask(path: str) -> np.ndarray:
    return np.array(Image.open(path).convert("P"), np.uint8)
