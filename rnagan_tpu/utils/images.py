"""Image grid utilities — the per-epoch sample dumps torchgan's Trainer writes
to its ``recon`` directory (reference ``histopathology_gan.py:301``) and the
matplotlib ``savegrid`` helper (reference ``generate_tissue_images.py:15-48``),
done host-side with PIL.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1, 1] float NHWC -> uint8 (the inverse of the Normalize(0.5, 0.5)
    input transform, reference ``histopathology_gan.py:106-109``)."""
    images = np.asarray(images, np.float32)
    images = (images * 0.5 + 0.5) * 255.0
    return np.clip(np.round(images), 0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: Optional[int] = None, pad: int = 2) -> None:
    """Tile NHWC images (float [-1,1] or uint8) into a grid PNG."""
    from PIL import Image

    if images.dtype != np.uint8:
        images = to_uint8(images)
    n, h, w, c = images.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    canvas = np.zeros((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c), np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        canvas[y : y + h, x : x + w] = images[i]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(canvas.squeeze() if c == 1 else canvas).save(path)
