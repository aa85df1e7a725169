"""Shared image reading.

The reference reads images as ``imageio.imread(f)[..., :3] / 255.``
(``load_llff.py:76``, ``eval_metrics_script.py:38``) — correct for 8-bit RGB
but silently wrong otherwise: a 2-D grayscale array gets its WIDTH axis
sliced to 3 (garbage shapes downstream), and 16-bit PNGs divided by 255 land
in [0, 257]. One shared reader fixes both while staying bit-identical to the
reference on the 8-bit RGB(A) images every shipped dataset uses.
"""

from __future__ import annotations

import numpy as np


def imread_rgb_float(path: str) -> np.ndarray:
    """Read an image as float RGB in [0, 1] ([H, W, 3], float64).

    Grayscale images are expanded to 3 channels; alpha is dropped; integer
    images are scaled by their dtype max (255 for uint8 — the reference's
    behavior — 65535 for uint16); float images are passed through.
    """
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    elif img.shape[-1] == 2:  # grayscale + alpha (LA): drop alpha, expand
        img = np.stack([img[..., 0]] * 3, axis=-1)
    img = img[..., :3]
    if np.issubdtype(img.dtype, np.floating):
        return img.astype(np.float64)
    return img / np.float64(np.iinfo(img.dtype).max)
