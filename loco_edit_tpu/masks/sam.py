"""SAM mask extraction (host-side stage).

The reference runs HF's mask-generation pipeline (facebook/sam-vit-large) on
the decoded image, saves ALL candidate masks plus per-mask overlay
visualizations, and exits when --sampling_mode; a follow-up run picks
--mask_index (src/modules/mask_segmentation.py:11-47, two-phase protocol at
edit.py:2237-2247). SAM inference stays a host-side torch stage for now (a
Flax SAM port is planned); it is gated so the rest of the framework works
without SAM weights.
"""

from __future__ import annotations

import os

import numpy as np

from loco_edit_tpu.utils.io import to_uint8


def segment_image(image_uint8: np.ndarray, model_name: str = "facebook/sam-vit-large",
                  filter_mask: int = 100, resolution: int = 256,
                  cache_folder: str | None = None) -> np.ndarray:
    """Run SAM mask-generation; returns (N, H, W) boolean masks resized to
    `resolution`, filtered by minimum area (reference filter_mask=100).
    cache_folder is the HF weights cache dir (reference
    mask_segmentation.py:11 cache_dir=args.cache_folder)."""
    try:
        from transformers import pipeline
    except ImportError as e:  # pragma: no cover
        raise ImportError("SAM masking needs transformers") from e
    from PIL import Image

    kw = {"model_kwargs": {"cache_dir": cache_folder}} if cache_folder else {}
    generator = pipeline("mask-generation", model=model_name, **kw)
    pil = Image.fromarray(image_uint8)
    outputs = generator(pil, points_per_batch=64)
    masks = []
    for m in outputs["masks"]:
        m = np.asarray(m, bool)
        if m.sum() <= filter_mask:
            continue
        mi = Image.fromarray(m.astype(np.uint8) * 255).resize(
            (resolution, resolution))
        masks.append(np.asarray(mi) > 127)
    if not masks:
        raise RuntimeError("SAM produced no masks above the area filter")
    return np.stack(masks)


def extract_and_cache_masks(args, x0: np.ndarray, mask_path: str) -> np.ndarray:
    """Decode x0 -> run SAM -> cache masks (+ overlay previews) at mask_path."""
    img = to_uint8(x0)[0]
    masks = segment_image(img, args.mask_model_name, args.filter_mask,
                          resolution=args.image_size,
                          cache_folder=getattr(args, "cache_folder", None) or None)
    os.makedirs(os.path.dirname(mask_path), exist_ok=True)
    # broadcast to 3 channels NHWC to match the edit mask convention
    masks3 = np.repeat(masks[:, :, :, None], 3, axis=-1)
    np.savez(mask_path, masks=masks3)
    _save_overlays(img, masks, os.path.dirname(mask_path))
    return masks3


def _save_overlays(img: np.ndarray, masks: np.ndarray, out_dir: str) -> None:
    from PIL import Image

    for i, m in enumerate(masks):
        mm = np.asarray(Image.fromarray(m.astype(np.uint8) * 255)
                        .resize((img.shape[1], img.shape[0]))) > 127
        overlay = img.copy()
        overlay[mm] = (0.5 * overlay[mm] + 0.5 * np.array([255, 0, 0])).astype(np.uint8)
        Image.fromarray(overlay).save(os.path.join(out_dir, f"mask_{i:03d}.png"))
