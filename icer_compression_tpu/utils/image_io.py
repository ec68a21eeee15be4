"""Image file IO for the CLI and examples (Pillow-based)."""

from __future__ import annotations

import numpy as np


def load_image(path: str, force_color: bool | None = None):
    """Load an image file.

    Returns (array, is_color): (h, w) uint8 for grayscale or (h, w, 3)
    uint8 RGB for color.  force_color True/False overrides auto-detection
    (mirrors the reference CLI's -c/-G flags, example/src/icer_util.c:126).
    """
    from PIL import Image

    im = Image.open(path)
    if force_color is True:
        im = im.convert("RGB")
        return np.asarray(im), True
    if force_color is False:
        im = im.convert("L")
        return np.asarray(im), False
    if im.mode in ("L", "I;16", "1"):
        return np.asarray(im.convert("L")), False
    arr = np.asarray(im.convert("RGB"))
    # auto: treat as color when channels actually differ
    if arr.ndim == 3 and not (arr[..., 0] == arr[..., 1]).all():
        return arr, True
    return arr[..., 0] if arr.ndim == 3 else arr, False


def save_image(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
