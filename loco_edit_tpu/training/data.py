"""Sharded training data loading.

Counterpart of the reference's MPI-sharded image loader
(src/models/guided_diffusion/image_datasets.py:11-123: rank/size dataset
sharding :83-99, class labels from filename prefixes :60-71, random-crop
pipeline :126-165). Here sharding is by jax process index; batches come out
NHWC in [-1, 1], ready to device_put against a DATA_AXIS sharding."""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
from PIL import Image

from loco_edit_tpu.data.datasets import _EXTS


def list_image_files_recursively(data_dir: str) -> list[str]:
    out: list[str] = []
    for root, _, files in sorted(os.walk(data_dir)):
        for f in sorted(files):
            if f.lower().endswith(_EXTS):
                out.append(os.path.join(root, f))
    return out


def _center_crop_resize(img: Image.Image, size: int) -> np.ndarray:
    """The reference's crop pipeline: downsample by halves then center-crop
    (image_datasets.py:126-146)."""
    while min(img.size) >= 2 * size:
        img = img.resize((img.size[0] // 2, img.size[1] // 2), Image.BOX)
    scale = size / min(img.size)
    img = img.resize((round(img.size[0] * scale), round(img.size[1] * scale)),
                     Image.BICUBIC)
    arr = np.asarray(img.convert("RGB"), np.float32)
    ch, cw = (arr.shape[0] - size) // 2, (arr.shape[1] - size) // 2
    arr = arr[ch:ch + size, cw:cw + size]
    return arr / 127.5 - 1.0


class ShardedImageLoader:
    """Infinite epoch iterator over an image tree, sharded across processes.

    class_cond: derive integer labels from the filename prefix before the
    first '_' (the reference's convention, image_datasets.py:60-67).
    """

    def __init__(self, data_dir: str, batch_size: int, image_size: int = 256,
                 class_cond: bool = False, seed: int = 0,
                 process_index: int | None = None,
                 process_count: int | None = None,
                 use_native: bool = True):
        import jax

        self.files = list_image_files_recursively(data_dir)
        if not self.files:
            raise FileNotFoundError(f"no images under {data_dir}")
        self.batch_size = batch_size
        self.image_size = image_size
        self.rng = np.random.default_rng(seed)
        pi = jax.process_index() if process_index is None else process_index
        pc = jax.process_count() if process_count is None else process_count
        self.files = self.files[pi::pc]
        self._native = None
        if use_native:
            from loco_edit_tpu import native

            if native.available():
                self._native = native
        self.labels = None
        if class_cond:
            names = [os.path.basename(p).split("_")[0] for p in self.files]
            classes = sorted(set(names))
            lut = {c: i for i, c in enumerate(classes)}
            self.labels = np.asarray([lut[n] for n in names], np.int32)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray | None]]:
        n = len(self.files)
        while True:
            order = self.rng.permutation(n)
            for s in range(0, n - self.batch_size + 1, self.batch_size):
                idx = order[s:s + self.batch_size]
                if self._native is not None:
                    try:
                        imgs = self._native.load_batch(
                            [self.files[i] for i in idx], self.image_size)
                    except IOError:
                        imgs = None
                else:
                    imgs = None
                if imgs is None:
                    imgs = np.stack([
                        _center_crop_resize(Image.open(self.files[i]),
                                            self.image_size)
                        for i in idx])
                labels = None if self.labels is None else self.labels[idx]
                yield imgs, labels
