"""Image utilities: grids + local image loading with reference transforms."""
from __future__ import annotations

import os

import numpy as np
from PIL import Image

from e4t_diffusion_tpu.data.dataset import smallest_max_size, center_crop


def image_grid(imgs, rows: int, cols: int) -> Image.Image:
    """(/root/reference/e4t/utils.py:181-190)."""
    assert len(imgs) == rows * cols
    w, h = imgs[0].size
    grid = Image.new("RGB", size=(cols * w, rows * h))
    for i, img in enumerate(imgs):
        grid.paste(img, box=(i % cols * w, i // cols * h))
    return grid


def load_image(path: str, resolution: int | None = None) -> Image.Image:
    """Local-path image loader (+ optional SmallestMaxSize/center-crop),
    mirroring /root/reference/e4t/utils.py:171-178. URLs are rejected:
    TPU training pods run without egress — stage files locally."""
    if path.startswith(("http://", "https://")):
        raise ValueError(
            f"URL inputs are not supported in the TPU build (no egress); "
            f"download {path} locally first.")
    img = Image.open(path).convert("RGB")
    if resolution:
        arr = np.asarray(img)
        arr = smallest_max_size(arr, resolution)
        arr = center_crop(arr, resolution)
        img = Image.fromarray(arr)
    return img


def to_pil(images01: np.ndarray) -> list:
    """(B, 3, H, W) float in [0,1] -> PIL list."""
    arr = (np.asarray(images01).transpose(0, 2, 3, 1) * 255).round().astype(np.uint8)
    return [Image.fromarray(a) for a in arr]
