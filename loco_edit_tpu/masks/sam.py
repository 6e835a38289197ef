"""SAM mask extraction.

The reference runs HF's mask-generation pipeline (facebook/sam-vit-large) on
the decoded image, saves ALL candidate masks plus per-mask overlay
visualizations, and exits when --sampling_mode; a follow-up run picks
--mask_index (src/modules/mask_segmentation.py:11-47, two-phase protocol at
edit.py:2237-2247).

Two backends:
  - `segment_image` — the reference's all-torch host pipeline (fallback).
  - `segment_image_flax_encoder` — the WHOLE model on the accelerator: ViT
    image encoder (masks/sam_flax.py) + prompt-encoder/mask-decoder
    (masks/sam_decoder_flax.py), both golden-parity tested, decode the full
    point grid in one jitted batch; only boolean candidate masks return to
    the host for NMS / area filter / IoU dedup. `use_flax_decoder=False`
    keeps the split mode (Flax encoder, host torch decode) for verification.
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


def _stability_scores(logits: "np.ndarray", mask_threshold: float = 0.0,
                      offset: float = 1.0) -> np.ndarray:
    """SAM's stability score: IoU of the mask binarized at threshold+offset
    vs threshold-offset on the raw logits (HF AMG default offset 1.0) —
    near-1 means the mask barely moves under threshold perturbation."""
    hi = (logits > (mask_threshold + offset)).reshape(logits.shape[0], -1)
    lo = (logits > (mask_threshold - offset)).reshape(logits.shape[0], -1)
    inter = hi.sum(-1).astype(np.float64)
    union = lo.sum(-1).astype(np.float64)
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _mask_boxes(masks: np.ndarray) -> np.ndarray:
    """Bounding boxes (x0, y0, x1, y1) of boolean masks (N, H, W)."""
    boxes = np.zeros((masks.shape[0], 4), np.float64)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if ys.size:
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    return boxes


def _box_nms(boxes: np.ndarray, scores: np.ndarray, iou: float) -> np.ndarray:
    """Greedy box NMS (the AMG postprocess step HF runs via torchvision);
    returns kept indices in descending score order. The pairwise IoU against
    the kept set is a vectorized numpy broadcast — a dense 32x32-grid scene
    proposes ~3k candidates, and an O(N^2) pure-Python inner loop costs
    seconds of host time when few masks are suppressed."""
    order = np.argsort(-scores)
    b = boxes[order].astype(np.float64)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    kept: list[int] = []
    for i in range(b.shape[0]):
        if kept:
            kb = b[kept]
            ix0 = np.maximum(b[i, 0], kb[:, 0])
            iy0 = np.maximum(b[i, 1], kb[:, 1])
            ix1 = np.minimum(b[i, 2], kb[:, 2])
            iy1 = np.minimum(b[i, 3], kb[:, 3])
            inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
            union = areas[i] + areas[kept] - inter
            if np.any((union > 0) & (inter / np.maximum(union, 1e-300) > iou)):
                continue
        kept.append(i)
    return order[kept].astype(np.int64)


class SamFlaxBundle:
    """Converted SAM params + configs, reusable across segment calls (the
    serve path converts once and segments many times). Carries a jit cache
    keyed by call geometry, so repeat segmentations reuse the compiled
    encoder/decoder programs instead of re-tracing them."""

    def __init__(self, cfg, dcfg, enc_params, dec_params):
        self.cfg, self.dcfg = cfg, dcfg
        self.enc_params, self.dec_params = enc_params, dec_params
        self.jit_cache: dict = {}

    def jitted(self, key, build):
        if key not in self.jit_cache:
            self.jit_cache[key] = build()
        return self.jit_cache[key]


def prepare_sam_flax(sam_model) -> SamFlaxBundle:
    """Convert a transformers SamModel into device-resident Flax params
    (scan-blocks encoder when the layer structure allows)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from loco_edit_tpu.masks.sam_decoder_flax import (
        convert_sam_decoder_state_dict,
        decoder_config_from_hf,
    )
    from loco_edit_tpu.masks.sam_flax import (
        config_from_hf,
        convert_sam_vision_state_dict,
    )

    import os

    cfg = config_from_hf(sam_model.config.vision_config)
    # scan the [windowed*K, global] blocks: one compiled layer body instead
    # of 24+ unrolled layers — flat compile time at vit-large under normal
    # local XLA. LOCO_SAM_SCAN=0 opts out (measured: the axon remote-compile
    # service in this dev environment compiles the unrolled program at ~30 s
    # per layer but stalls out on the scanned one).
    if cfg.block_structure is not None and os.environ.get(
            "LOCO_SAM_SCAN", "1") != "0":
        cfg = dataclasses.replace(cfg, scan_blocks=True)
    sd = {k: v.numpy() for k, v in sam_model.state_dict().items()}
    enc_sd = {k: v for k, v in sd.items() if k.startswith("vision_encoder.")}
    dcfg = decoder_config_from_hf(sam_model.config)
    # device arrays, not host numpy: numpy leaves indexed by tracers inside
    # jit would trip TracerArrayConversionError
    return SamFlaxBundle(
        cfg, dcfg,
        jax.tree.map(jnp.asarray, convert_sam_vision_state_dict(enc_sd, cfg)),
        jax.tree.map(jnp.asarray, convert_sam_decoder_state_dict(sd, dcfg)))


def segment_image_flax_encoder(
    image_uint8: np.ndarray, sam_model=None, *,
    prepared: SamFlaxBundle | None = None,
    use_flax_decoder: bool = True,
    points_per_side: int = 32, points_per_batch: int = 64,
    filter_mask: int = 100, resolution: int = 256,
    iou_threshold: float = 0.88, dedup_iou: float = 0.9,
    mask_threshold: float = 0.0, stability_thresh: float = 0.95,
    box_nms_iou: float = 0.7) -> np.ndarray:
    """Mask generation with SAM on the accelerator.

    sam_model: a transformers SamModel (host, eval mode, the weight source);
    prepared: a `prepare_sam_flax(sam_model)` bundle to skip re-conversion
    across calls (built on the fly if None). With a prepared bundle and the
    flax decoder, sam_model may be None — the torch model is not needed at
    all (the serve path drops it after conversion). Returns
    (N, resolution, resolution) boolean masks.

    With use_flax_decoder (default) the model runs jitted on the
    accelerator — encoder once, then the point grid through the two-way
    transformer and mask upscaling in fixed-size point batches (one compiled
    program, `points_per_batch` points per launch, bounding the upscaled-
    logits working set exactly like HF's points_per_batch) — and only boolean
    candidate masks come back to the host for NMS/dedup.
    use_flax_decoder=False keeps the round-2 split (Flax encoder, host torch
    SamModel decode) as the verification fallback.

    Pre/postprocessing mirrors the HF pipeline the reference runs
    (crops_n_layers=0, i.e. no crop pyramid): bilinear longest-edge resize +
    zero-pad-to-square input (SamImageProcessor), a 32x32 point grid over
    the original image, all 3 candidate masks per point, low-res logits
    upscaled to the padded frame -> cropped -> resized to the image frame
    BEFORE scoring (post_process_masks order), predicted-IoU filter (0.88),
    stability score filter (0.95 at +/-1.0 logit offset) on the upscaled
    logits, greedy bounding-box NMS (0.7) scored by predicted IoU, then the
    reference's area filter plus a mask-IoU dedup. The returned masks are
    produced from the same cropped logits at `resolution` (the edit-model
    frame; identical to the image frame in the CLI, where the input is the
    decoded x0)."""
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from loco_edit_tpu.masks.sam_flax import SamViTEncoder

    if prepared is None:
        if sam_model is None:
            raise ValueError("need sam_model or a prepare_sam_flax bundle")
        prepared = prepare_sam_flax(sam_model)
    if not use_flax_decoder and sam_model is None:
        raise ValueError("the torch-decode fallback needs sam_model")
    cfg = prepared.cfg
    flax_params = prepared.enc_params

    size = cfg.image_size
    orig_h, orig_w = image_uint8.shape[:2]
    # SamImageProcessor: longest-edge bilinear resize, then zero-pad (in
    # normalized space) to a size x size square
    scale = size / max(orig_h, orig_w)
    new_h = int(orig_h * scale + 0.5)
    new_w = int(orig_w * scale + 0.5)
    pil = Image.fromarray(image_uint8).resize((new_w, new_h), Image.BILINEAR)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    x = np.zeros((size, size, 3), np.float32)
    x[:new_h, :new_w] = (np.asarray(pil, np.float32) - mean) / std

    # uniform point grid over the ORIGINAL image (HF build_point_grid),
    # mapped into resized-frame pixel coords the prompt encoder expects
    gx = (np.arange(points_per_side) + 0.5) / points_per_side * new_w
    gy = (np.arange(points_per_side) + 0.5) / points_per_side * new_h
    pts = np.stack(np.meshgrid(gx, gy), -1).reshape(1, -1, 1, 2).astype(np.float32)
    n_pts = pts.shape[1]

    ppb = max(1, min(points_per_batch, n_pts))
    n_pad = (-n_pts) % ppb
    if n_pad:  # pad the grid to a batch multiple; extras dropped below
        pts = np.concatenate([pts, np.repeat(pts[:, :1], n_pad, 1)], axis=1)

    if use_flax_decoder:
        from loco_edit_tpu.masks.sam_decoder_flax import SamMaskDecodeModel

        dcfg = prepared.dcfg
        decoder_params = prepared.dec_params

        encode = prepared.jitted("encode", lambda: jax.jit(
            lambda px: SamViTEncoder(cfg).apply(flax_params, px)))

        def _resize(m, h, w):
            # torch F.interpolate(bilinear) semantics: half-pixel, no AA
            return jax.image.resize(m, (m.shape[0], h, w), "bilinear",
                                    antialias=False)

        def build_decode():
            @jax.jit
            def decode_batch(emb, points, labels):
                m, s = SamMaskDecodeModel(dcfg).apply(
                    decoder_params, emb, points=points, labels=labels)
                m = m.reshape(-1, *m.shape[-2:])  # (3*ppb, h, w) low logits
                # HF post_process_masks: low-res -> padded frame -> crop ->
                # image frame
                m = _resize(m, size, size)[:, :new_h, :new_w]
                mi = _resize(m, orig_h, orig_w)
                # stability on the image-frame logits (filter_masks order)
                hi = (mi > mask_threshold + 1.0).sum((1, 2)).astype(jnp.float32)
                lo = (mi > mask_threshold - 1.0).sum((1, 2)).astype(jnp.float32)
                stab = jnp.where(lo > 0, hi / jnp.maximum(lo, 1.0), 0.0)
                if (orig_h, orig_w) != (resolution, resolution):
                    mi = _resize(m, resolution, resolution)
                return mi > mask_threshold, s.reshape(-1), stab

            return decode_batch

        decode_batch = prepared.jitted(
            ("decode", ppb, new_h, new_w, orig_h, orig_w, resolution,
             mask_threshold), build_decode)

        emb = encode(jnp.asarray(x[None]))
        parts = []
        for i in range(0, pts.shape[1], ppb):
            batch = jnp.asarray(pts[:, i:i + ppb])
            parts.append(decode_batch(
                emb, batch, jnp.ones(batch.shape[:3], jnp.int32)))
        cand = np.concatenate([np.asarray(p[0]) for p in parts])[:3 * n_pts]
        iou = np.concatenate([np.asarray(p[1]) for p in parts])[:3 * n_pts]
        stability = np.concatenate(
            [np.asarray(p[2]) for p in parts])[:3 * n_pts]
    else:
        import torch

        emb = SamViTEncoder(cfg).apply(flax_params, jnp.asarray(x[None]))
        emb_t = torch.from_numpy(np.ascontiguousarray(
            np.asarray(emb, np.float32).transpose(0, 3, 1, 2)))

        def interp(t, h, w):
            return torch.nn.functional.interpolate(
                t, size=(h, w), mode="bilinear")

        cand_l, iou_l, stab_l = [], [], []
        with torch.no_grad():
            for i in range(0, pts.shape[1], ppb):
                points = torch.from_numpy(pts[:, i:i + ppb])
                labels = torch.ones(points.shape[:3], dtype=torch.int32)
                out = sam_model(image_embeddings=emb_t, input_points=points,
                                input_labels=labels, multimask_output=True)
                low = out.pred_masks[0].reshape(
                    -1, *out.pred_masks.shape[-2:])[:, None].float()
                m = interp(low, size, size)[..., :new_h, :new_w]
                mi = interp(m, orig_h, orig_w)[:, 0]
                stab_l.append(_stability_scores(mi.numpy(), mask_threshold))
                if (orig_h, orig_w) != (resolution, resolution):
                    mi = interp(m, resolution, resolution)[:, 0]
                cand_l.append((mi > mask_threshold).numpy())
                iou_l.append(out.iou_scores[0].reshape(-1).float().numpy())
        cand = np.concatenate(cand_l)[:3 * n_pts]
        iou = np.concatenate(iou_l)[:3 * n_pts]
        stability = np.concatenate(stab_l)[:3 * n_pts]

    # shared filter semantics for both backends (pred-IoU + stability, with
    # the keep-at-least-one fallback)
    keep = (iou >= iou_threshold) & (stability >= stability_thresh)
    if not keep.any():
        keep = iou >= iou.max() - 1e-6          # keep at least the best mask
    iou = iou[keep]
    cand = cand[keep]

    nms_keep = _box_nms(_mask_boxes(cand), iou, box_nms_iou)
    cand = cand[nms_keep]

    out_masks: list[np.ndarray] = []
    for m in cand:
        if m.sum() <= filter_mask:
            continue
        dup = False
        for prev in out_masks:
            inter = np.logical_and(m, prev).sum()
            union = np.logical_or(m, prev).sum()
            if union and inter / union > dedup_iou:
                dup = True
                break
        if not dup:
            out_masks.append(m)
    if not out_masks:
        raise RuntimeError("SAM produced no masks above the area filter")
    return np.stack(out_masks)


def extract_and_cache_masks(args, x0: np.ndarray, mask_path: str) -> np.ndarray:
    """Decode x0 -> run SAM -> cache masks (+ overlay previews) at mask_path."""
    img = to_uint8(x0)[0]
    cache = getattr(args, "cache_folder", None) or None
    if getattr(args, "mask_backend", "hf_pipeline") == "flax":
        from transformers import SamModel

        try:
            sam_model = SamModel.from_pretrained(
                args.mask_model_name, cache_dir=cache).eval()
        except Exception as e:  # noqa: BLE001 — surface the actionable fix
            raise RuntimeError(
                f"could not load SAM weights {args.mask_model_name!r} "
                "(no hub access?): pass --mask_model_name pointing at a "
                "local SamModel.save_pretrained dir or HF cache, or use "
                "--mask_backend hf_pipeline with a warm HF cache"
            ) from e
        masks = segment_image_flax_encoder(
            img, sam_model, filter_mask=args.filter_mask,
            resolution=args.image_size)
    else:
        masks = segment_image(img, args.mask_model_name, args.filter_mask,
                              resolution=args.image_size, cache_folder=cache)
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
