"""Image output.  The reference quantizes into a QImage per pixel write
(reference include/image.h:14-16); here the framebuffer stays float on
device and is quantized once at save."""

from __future__ import annotations

import numpy as np


def save_png(path: str, img) -> None:
    """img: (H, W, 3) float in [0, 1] (already tonemapped)."""
    from PIL import Image

    arr = np.asarray(img)
    q = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(q, "RGB").save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
