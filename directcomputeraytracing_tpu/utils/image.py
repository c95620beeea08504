"""Image I/O and color transfer helpers (PNG/BMP export via PIL).

Replaces the reference's WIC/BMP readback path
(reference: Source/SaveImageToFile.cpp).
"""

import numpy as np


def linear_to_srgb(x):
    x = np.clip(np.asarray(x, np.float64), 0.0, 1.0)
    return np.where(x <= 0.0031308, 12.92 * x,
                    1.055 * np.power(x, 1.0 / 2.4) - 0.055)


def save_image(path, rgb_linear, srgb=True):
    """rgb_linear: (H, W, 3) float array in [0, inf); tone-mapped values
    expected in [0, 1]. Writes PNG or BMP by extension."""
    from PIL import Image

    img = np.asarray(rgb_linear, np.float64)
    if srgb:
        img = linear_to_srgb(img)
    img8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img8, mode="RGB").save(path)


def load_image(path):
    """Returns (H, W, C) float32 in [0, 1] (no transfer decode)."""
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) / 255.0
