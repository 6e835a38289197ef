"""Image IO: save [-1,1] NHWC batches as PNG grids (the reference uses
torchvision's save_image with nrow=batch, src/modules/edit.py:2595-2599;
here plain numpy + PIL)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8."""
    x = np.asarray(x, dtype=np.float32)
    x = np.clip(x / 2.0 + 0.5, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8)


def to_uint8_pixels_device(x):
    """to_uint8 as an on-device jnp op (round-half-up identical to the numpy
    path): converting edited strips to their final PNG payload BEFORE the
    host pull cuts the device->host transfer 4x — on the tunneled dev chip
    that transfer runs at ~35 MB/s and costs ~1 s per 45-frame 256px f32
    strip set (scripts/bench_e2e_breakdown.py). Mirrors the reference's own
    uint8 chunk buffering in the IF sampler (edit.py:1450-1475)."""
    import jax.numpy as jnp

    y = jnp.clip(x.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
    return jnp.floor(y * 255.0 + 0.5).astype(jnp.uint8)


def save_image_grid(x: np.ndarray, path: str, nrow: int | None = None) -> None:
    """x: (B, H, W, C) in [-1, 1] floats, or already-converted uint8 pixels
    (saved as-is)."""
    arr = np.asarray(x)
    arr = arr if arr.dtype == np.uint8 else to_uint8(arr)
    b, h, w, c = arr.shape
    nrow = b if nrow is None else nrow
    ncol = (b + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), np.uint8)
    for i in range(b):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid.squeeze() if c == 1 else grid).save(path)
