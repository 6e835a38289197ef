"""Flax SAM prompt-encoder/mask-decoder golden parity against torch
(random-init tiny SamModel -> state_dict -> converter -> same prompts),
covering point prompts (with the not-a-point pad), boxes, input masks,
multimask on/off, and the end-to-end grid decode against SamModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.masks.sam_decoder_flax import (
    SamMaskDecodeModel,
    convert_sam_decoder_state_dict,
    decoder_config_from_hf,
)


def _tiny_torch_sam():
    torch = pytest.importorskip("torch")
    from transformers import SamConfig
    from transformers.models.sam.modeling_sam import SamModel

    cfg = SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=32, patch_size=8, window_size=2,
            global_attn_indexes=[1], mlp_ratio=2.0, output_channels=32,
            num_pos_feats=16),
        prompt_encoder_config=dict(
            hidden_size=32, image_size=32, patch_size=8,
            image_embedding_size=4, mask_input_channels=8),
        mask_decoder_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            mlp_dim=64, iou_head_depth=3, iou_head_hidden_dim=16),
        attn_implementation="eager")
    torch.manual_seed(0)
    model = SamModel(cfg).eval()
    with torch.no_grad():
        for p_ in model.parameters():
            p_.add_(torch.randn_like(p_) * 0.05)
        # buffers too: the shared positional embedding is a buffer
        model.shared_image_embedding.positional_embedding.copy_(
            torch.randn(2, 16) * 2.0)
        model._tie_weights()
    return torch, cfg, model


@pytest.fixture(scope="module")
def sam():
    torch, cfg, model = _tiny_torch_sam()
    dcfg = decoder_config_from_hf(cfg)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_sam_decoder_state_dict(sd, dcfg))
    return torch, cfg, model, dcfg, params


def _rand_embeddings(rng, e=4, c=32, b=1):
    return rng.normal(size=(b, e, e, c)).astype(np.float32)


def test_point_prompts_match_torch(sam):
    torch, _, model, dcfg, params = sam
    rng = np.random.default_rng(1)
    emb = _rand_embeddings(rng)
    pts = rng.uniform(2, 30, size=(1, 5, 1, 2)).astype(np.float32)
    lbl = np.ones((1, 5, 1), np.int32)

    masks, iou = SamMaskDecodeModel(dcfg).apply(
        params, jnp.asarray(emb), points=jnp.asarray(pts),
        labels=jnp.asarray(lbl))

    with torch.no_grad():
        out = model(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            input_points=torch.from_numpy(pts),
            input_labels=torch.from_numpy(lbl),
            multimask_output=True)
    np.testing.assert_allclose(np.asarray(iou), out.iou_scores.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=2e-4)


def test_negative_and_padded_labels_match_torch(sam):
    torch, _, model, dcfg, params = sam
    rng = np.random.default_rng(2)
    emb = _rand_embeddings(rng)
    pts = rng.uniform(0, 31, size=(1, 2, 3, 2)).astype(np.float32)
    lbl = np.array([[[1, 0, -10], [1, 1, 0]]], np.int32)

    masks, iou = SamMaskDecodeModel(dcfg).apply(
        params, jnp.asarray(emb), points=jnp.asarray(pts),
        labels=jnp.asarray(lbl))
    with torch.no_grad():
        out = model(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            input_points=torch.from_numpy(pts),
            input_labels=torch.from_numpy(lbl))
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=2e-4)


def test_boxes_and_single_mask_output(sam):
    torch, _, model, dcfg, params = sam
    rng = np.random.default_rng(3)
    emb = _rand_embeddings(rng)
    boxes = np.array([[[4.0, 4.0, 20.0, 24.0], [1.0, 2.0, 30.0, 12.0]]],
                     np.float32)

    masks, iou = SamMaskDecodeModel(dcfg).apply(
        params, jnp.asarray(emb), boxes=jnp.asarray(boxes),
        multimask_output=False)
    with torch.no_grad():
        out = model(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            input_boxes=torch.from_numpy(boxes), multimask_output=False)
    assert masks.shape == (1, 2, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(iou), out.iou_scores.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=2e-4)


def test_input_masks_dense_prompt(sam):
    torch, _, model, dcfg, params = sam
    rng = np.random.default_rng(4)
    emb = _rand_embeddings(rng)
    pts = rng.uniform(2, 30, size=(1, 1, 1, 2)).astype(np.float32)
    lbl = np.ones((1, 1, 1), np.int32)
    im = rng.normal(size=(1, 16, 16)).astype(np.float32)

    masks, _ = SamMaskDecodeModel(dcfg).apply(
        params, jnp.asarray(emb), points=jnp.asarray(pts),
        labels=jnp.asarray(lbl), input_masks=jnp.asarray(im[..., None]))
    with torch.no_grad():
        out = model(
            image_embeddings=torch.from_numpy(emb.transpose(0, 3, 1, 2)),
            input_points=torch.from_numpy(pts),
            input_labels=torch.from_numpy(lbl),
            input_masks=torch.from_numpy(im[:, None]))
    np.testing.assert_allclose(np.asarray(masks), out.pred_masks.numpy(),
                               atol=2e-4)


def test_convert_rejects_unknown_decoder_keys(sam):
    _, cfg, model, dcfg, _ = sam
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["mask_decoder.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_sam_decoder_state_dict(sd, dcfg)


def test_amg_flax_pipeline_matches_host_decode(sam, tmp_path):
    """End-to-end: the all-Flax AMG (encoder + decoder + jax resize) produces
    the same mask set as the encoder-only path that decodes through torch
    SamModel, on the same tiny model and image."""
    torch, cfg, model, dcfg, params = sam
    from loco_edit_tpu.masks.sam import segment_image_flax_encoder

    rng = np.random.default_rng(7)
    img = (rng.uniform(0, 255, size=(40, 40, 3))).astype(np.uint8)
    kw = dict(points_per_side=4, filter_mask=0, resolution=16,
              iou_threshold=-1e9, stability_thresh=-1.0, dedup_iou=1.1)
    got = segment_image_flax_encoder(img, model, use_flax_decoder=True, **kw)
    want = segment_image_flax_encoder(img, model, use_flax_decoder=False, **kw)
    assert got.shape == want.shape
    assert (got == want).mean() > 0.995  # resize-boundary pixels may differ


def test_extract_and_cache_masks_flax_backend(sam, tmp_path, monkeypatch):
    """CLI wiring: --mask_backend flax drives the all-Flax AMG through
    extract_and_cache_masks (SamModel loaded from a local save_pretrained
    dir), writing the NHWC 3-channel mask cache + overlays."""
    import argparse

    torch, cfg, model, _, _ = sam
    from loco_edit_tpu.masks.sam import extract_and_cache_masks

    mdir = tmp_path / "tiny-sam"
    model.save_pretrained(mdir)

    args = argparse.Namespace(
        mask_model_name=str(mdir), mask_backend="flax", filter_mask=0,
        image_size=16, cache_folder=None)
    rng = np.random.default_rng(11)
    x0 = rng.uniform(-1, 1, size=(1, 24, 24, 3)).astype(np.float32)
    mask_path = str(tmp_path / "run" / "mask.npz")
    masks3 = extract_and_cache_masks(args, x0, mask_path)
    assert masks3.ndim == 4 and masks3.shape[1:] == (16, 16, 3)
    assert masks3.dtype == bool
    cached = np.load(mask_path if mask_path.endswith(".npz")
                     else mask_path + ".npz")["masks"]
    np.testing.assert_array_equal(cached, masks3)
