"""Flax SAM vision encoder golden parity against the torch implementation
(random-init tiny SamVisionConfig -> state_dict -> converter -> same pixels),
covering windowed + global layers, decomposed rel-pos, and the neck."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.masks.sam_flax import (
    SamViTConfig,
    SamViTEncoder,
    config_from_hf,
    convert_sam_vision_state_dict,
)


def _tiny_torch_encoder():
    torch = pytest.importorskip("torch")
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    hf_cfg = SamVisionConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        image_size=32, patch_size=8, window_size=2,
        global_attn_indexes=[1], mlp_ratio=2.0, output_channels=16,
        attn_implementation="eager")
    torch.manual_seed(0)
    enc = SamVisionEncoder(hf_cfg).eval()
    # zero-init rel-pos tables carry no signal; randomize everything
    with torch.no_grad():
        for p in enc.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return torch, hf_cfg, enc


def test_sam_vision_encoder_matches_torch():
    torch, hf_cfg, enc = _tiny_torch_encoder()
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_sam_vision_state_dict(sd, cfg))

    x = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(SamViTEncoder(cfg).apply(params, jnp.asarray(x)))

    with torch.no_grad():
        want = enc(torch.from_numpy(x.transpose(0, 3, 1, 2))
                   ).last_hidden_state.numpy()
    # torch neck outputs channels-first
    want = want.transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_sam_rel_pos_interpolation_path():
    """When the stored rel-pos table length differs from 2*size-1 the table is
    linearly resized (HF get_rel_pos F.interpolate branch) — exercise it by
    loading a window-4 table into a window-2 run via the public module."""
    from loco_edit_tpu.masks.sam_flax import _rel_pos_table

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rel = np.random.default_rng(2).normal(size=(7, 8)).astype(np.float32)  # 2*4-1
    got = np.asarray(_rel_pos_table(jnp.asarray(rel), size=2))             # -> 3
    t = F.interpolate(torch.from_numpy(rel).reshape(1, 7, -1).permute(0, 2, 1),
                      size=3, mode="linear")
    t = t.reshape(-1, 3).permute(1, 0).numpy()
    coords = np.arange(2)[:, None] - np.arange(2)[None, :] + 1
    want = t[coords]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convert_rejects_unknown_vision_keys():
    _, hf_cfg, enc = _tiny_torch_encoder()
    cfg = config_from_hf(hf_cfg)
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    sd["layers.9.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_sam_vision_state_dict(sd, cfg)
    # prompt-encoder / mask-decoder keys are expected and skipped
    sd.pop("layers.9.bogus.weight")
    sd["prompt_encoder.foo.weight"] = np.zeros((1,), np.float32)
    convert_sam_vision_state_dict(sd, cfg)


def test_presets_shape():
    from loco_edit_tpu.masks.sam_flax import VIT_BASE, VIT_LARGE

    assert VIT_LARGE.num_layers == 24 and VIT_LARGE.hidden_size == 1024
    assert VIT_BASE.global_attn_indexes == (2, 5, 8, 11)
    assert SamViTConfig().grid == 64


def test_amg_stability_scores():
    """Stability = IoU of the +/-offset binarizations: a steep mask scores
    ~1, a shallow-sloped mask scores low."""
    from loco_edit_tpu.masks.sam import _stability_scores

    steep = np.full((1, 8, 8), -10.0)
    steep[0, 2:6, 2:6] = 10.0                      # far from threshold
    shallow = np.linspace(-1.5, 1.5, 64).reshape(1, 8, 8)  # hugs threshold
    s = _stability_scores(np.concatenate([steep, shallow]), 0.0, offset=1.0)
    assert s[0] == pytest.approx(1.0)
    assert s[1] < 0.8


def test_amg_box_nms():
    from loco_edit_tpu.masks.sam import _box_nms, _mask_boxes

    m = np.zeros((3, 16, 16), bool)
    m[0, 0:8, 0:8] = True       # box A
    m[1, 1:8, 1:8] = True       # overlaps A heavily
    m[2, 10:15, 10:15] = True   # disjoint
    boxes = _mask_boxes(m)
    np.testing.assert_allclose(boxes[0], (0, 0, 8, 8))
    keep = _box_nms(boxes, np.array([0.9, 0.95, 0.5]), iou=0.7)
    # the higher-scored overlapper (idx 1) suppresses idx 0; idx 2 survives
    assert set(keep.tolist()) == {1, 2}
    assert keep[0] == 1  # descending score order


def test_amg_box_nms_vectorized_matches_bruteforce():
    """The broadcast inner loop must keep greedy-NMS semantics exactly: a
    scalar O(N^2) re-implementation is the oracle on random box soups."""
    from loco_edit_tpu.masks.sam import _box_nms

    def brute(boxes, scores, iou):
        order = np.argsort(-scores)
        keep = []
        for i in order:
            ok = True
            for j in keep:
                bi, bj = boxes[i], boxes[j]
                ix0, iy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
                ix1, iy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
                inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
                union = ((bi[2] - bi[0]) * (bi[3] - bi[1])
                         + (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter)
                if union > 0 and inter / union > iou:
                    ok = False
                    break
            if ok:
                keep.append(int(i))
        return np.asarray(keep, np.int64)

    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 60
        x0 = rng.uniform(0, 20, (n, 2))
        wh = rng.uniform(1, 12, (n, 2))
        boxes = np.concatenate([x0, x0 + wh], axis=1)
        boxes[:3, 2:] = boxes[:3, :2]  # a few degenerate zero-area boxes
        scores = rng.uniform(size=n)
        got = _box_nms(boxes, scores, iou=0.5)
        want = brute(boxes, scores, 0.5)
        np.testing.assert_array_equal(got, want)


def test_segment_image_flax_encoder_end_to_end():
    """Full TPU-encoder mask-generation machinery on a tiny random SamModel:
    Flax embeddings -> host prompt-encoder/mask-decoder -> filtered masks."""
    torch = pytest.importorskip("torch")
    from transformers import SamConfig, SamModel, SamVisionConfig

    vc = SamVisionConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, image_size=32, patch_size=8,
                         window_size=2, global_attn_indexes=[1],
                         mlp_ratio=2.0, output_channels=16, num_pos_feats=8,
                         attn_implementation="eager")
    cfg = SamConfig(
        vision_config=vc.to_dict(),
        prompt_encoder_config=dict(hidden_size=16, image_embedding_size=4,
                                   image_size=32, patch_size=8),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 num_hidden_layers=1, mlp_dim=32,
                                 iou_head_hidden_dim=16))
    torch.manual_seed(0)
    model = SamModel(cfg).eval()

    from loco_edit_tpu.masks.sam import segment_image_flax_encoder

    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3)).astype(np.uint8)
    masks = segment_image_flax_encoder(
        img, model, points_per_side=2, filter_mask=0, resolution=16,
        iou_threshold=-1e9)
    assert masks.ndim == 3 and masks.shape[1:] == (16, 16)
    assert masks.dtype == bool


def test_scan_blocks_encoder_matches_unrolled():
    """scan_blocks=True (layer blocks via nn.scan, flat compile size) is
    numerically identical to the unrolled golden-tested encoder, from the
    same torch state_dict."""
    torch = pytest.importorskip("torch")
    import dataclasses

    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    hf_cfg = SamVisionConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        image_size=32, patch_size=8, window_size=2,
        global_attn_indexes=[1, 3], mlp_ratio=2.0, output_channels=16,
        attn_implementation="eager")
    torch.manual_seed(1)
    enc = SamVisionEncoder(hf_cfg).eval()
    with torch.no_grad():
        for p in enc.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    sd = {k: v.numpy() for k, v in enc.state_dict().items()}

    cfg = config_from_hf(hf_cfg)
    assert cfg.block_structure == (2, 1)
    cfg_scan = dataclasses.replace(cfg, scan_blocks=True)

    x = np.random.default_rng(4).normal(size=(1, 32, 32, 3)).astype(np.float32)
    want = np.asarray(SamViTEncoder(cfg).apply(
        jax.tree.map(jnp.asarray, convert_sam_vision_state_dict(sd, cfg)),
        jnp.asarray(x)))
    got = np.asarray(SamViTEncoder(cfg_scan).apply(
        jax.tree.map(jnp.asarray, convert_sam_vision_state_dict(sd, cfg_scan)),
        jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # non-uniform structure must be rejected, not silently mis-stacked
    bad = dataclasses.replace(cfg_scan, global_attn_indexes=(0, 3))
    assert bad.block_structure is None
    with pytest.raises(ValueError, match="uniform"):
        convert_sam_vision_state_dict(sd, bad)


def test_loco_sam_scan_env_opt_out(monkeypatch):
    """LOCO_SAM_SCAN=0 keeps prepare_sam_flax on the unrolled encoder (for
    compile services that stall on scanned programs); default prefers scan
    when the block structure is uniform."""
    from tests.test_sam_decoder_flax import _tiny_torch_sam

    from loco_edit_tpu.masks.sam import prepare_sam_flax

    # tiny model: 2 layers, globals=[1] -> uniform (1 block, 1 windowed)
    _, _, model = _tiny_torch_sam()
    b = prepare_sam_flax(model)
    assert b.cfg.scan_blocks  # default: scan when structure allows
    assert "block_0" in b.enc_params["params"]

    monkeypatch.setenv("LOCO_SAM_SCAN", "0")
    b2 = prepare_sam_flax(model)
    assert not b2.cfg.scan_blocks
    assert "layer_0" in b2.enc_params["params"]
