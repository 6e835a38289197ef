"""Warm edit server with the T2I engines (tiny models): /edit (masked +
semantic), /edit_batch, engine-specific error surfaces. BENCH.md justifies
the serve path by the T2I cold-compile bill (SD 810 s / LCM 944 s / IF 448 s
cold) — these tests pin that the engines that most need a warm process can
actually be served (VERDICT round 4, Missing #3)."""

import base64

import numpy as np
import pytest

from test_cli_t2i import _tiny_sd_bundle


def _make_service(model_name, tmp_path, extra=()):
    from loco_edit_tpu.cli.args import parse_args, preset
    from loco_edit_tpu.serve import EditService

    args = preset(parse_args([
        "--model_name", model_name, "--dataset_name", "Random",
        "--for_steps", "6", "--inv_steps", "6", "--edit_t", "0.7",
        "--guidance_scale", "3.0", "--num_inference_steps", "4",
        "--edit_t_idx", "2", "--pca_rank", "1", "--pca_rank_null", "1",
        "--null_space_projection", "true", "--use_mask", "false",
        "--x_space_guidance_num_step", "2", "--vis_num", "1",
        "--performance_boosting_t", "0",
        "--result_folder", str(tmp_path), "--seed", "7", *extra]))
    svc = EditService(args)
    svc.pipe.cfg.save_images = False
    svc.pipe.cfg.min_iter, svc.pipe.cfg.max_iter = 1, 2
    return svc


def _strip(out, key="0"):
    dt = np.uint8 if out["dtype"] == "uint8" else np.float32
    return np.frombuffer(base64.b64decode(out["strips"][key]),
                         dt).reshape(out["shape"])


def test_sd_serve_edit_and_batch(tmp_path, monkeypatch):
    import loco_edit_tpu.models.t2i_registry as reg

    monkeypatch.setattr(reg, "load_sd_bundle", _tiny_sd_bundle)
    svc = _make_service("stable-diffusion-tiny", tmp_path)
    assert svc.engine == "sd"
    assert svc.health()["engine"] == "sd"
    # tiny VAE decodes 8x8 latents to 16x16 images: the mask bbox is in
    # decoded-image coordinates (the pullback output space)
    assert tuple(svc.mask_shape[1:3]) == (16, 16)

    # unsupervised (no edit_prompt -> semantic defaults False), masked
    out = svc.edit({"seed": 1, "for_prompt": "a cat",
                    "mask_bbox": [0, 8, 0, 8], "sample_name": "s0"})
    assert out["null_space_projection"] is True
    assert out["dtype"] == "uint8"          # serve default: PNG payload
    assert _strip(out).shape[1:] == tuple(svc.mask_shape[1:])

    # text-supervised (edit_prompt given -> semantic defaults True)
    out2 = svc.edit({"seed": 2, "for_prompt": "a cat",
                     "edit_prompt": "a smiling cat",
                     "mask_bbox": [0, 8, 0, 8], "sample_name": "s1",
                     "pixel": False})
    assert out2["dtype"] == "float32"

    # batch: ONE batched generation for both seeds
    outb = svc.edit_batch({"for_prompt": "a cat", "items": [
        {"seed": 3, "mask_bbox": [0, 8, 0, 8]},
        {"seed": 4, "mask_bbox": [0, 8, 0, 8]}]})
    assert len(outb["results"]) == 2
    assert outb["null_space_projection"] is True
    for r in outb["results"]:
        assert _strip(r).shape[1:] == tuple(svc.mask_shape[1:])

    # SD /edit takes seeds, not images
    with pytest.raises(ValueError):
        svc.edit({"image": base64.b64encode(b"\x00" * 4).decode(),
                  "for_prompt": "a cat"})
    # for_prompt is required
    with pytest.raises(ValueError):
        svc.edit({"seed": 0})


def test_lcm_serve_edit(tmp_path, monkeypatch):
    import loco_edit_tpu.models.t2i_registry as reg

    monkeypatch.setattr(reg, "load_sd_bundle", _tiny_sd_bundle)
    svc = _make_service("LCM_tiny", tmp_path)
    assert svc.engine == "lcm"

    # unsupervised power iteration (semantic False -> non_semantic True)
    out = svc.edit({"seed": 1, "for_prompt": "a man",
                    "mask_bbox": [0, 8, 0, 8], "semantic": False,
                    "sample_name": "s0"})
    assert out["null_space_projection"] is True
    assert _strip(out).shape[1:] == tuple(svc.mask_shape[1:])
    # the per-request non_semantic override is restored afterwards
    assert svc.pipe.cfg.non_semantic is False

    outb = svc.edit_batch({"for_prompt": "a man",
                           "edit_prompt": "a man with glasses",
                           "items": [{"seed": 2}, {"seed": 3}]})
    assert len(outb["results"]) == 2
    assert outb["null_space_projection"] is False   # maskless batch
    for r in outb["results"]:
        # maskless rows must NOT zero the direction (all-False mask row
        # would make the prompt-delta 0/0 = NaN): pixels must be finite
        # and non-constant
        s = _strip(r)
        assert np.all(np.isfinite(np.asarray(s, np.float32)))
        assert s.min() != s.max()

    with pytest.raises(ValueError):
        svc.invert({"image": ""})    # LCM has no inversion path


def test_if_serve_edit(tmp_path, monkeypatch):
    svc = _make_service("DeepFloyd_IF_tiny", tmp_path)
    assert svc.engine == "if"
    # IF edits pixels directly: mask space == sample space
    assert svc.mask_shape == (1,) + tuple(svc.sample_shape)

    h = svc.sample_shape[0]
    out = svc.edit({"seed": 5, "for_prompt": "a cat",
                    "edit_prompt": "a sleeping cat",
                    "mask_bbox": [0, h // 2, 0, h // 2],
                    "sample_name": "s0"})
    assert out["null_space_projection"] is True
    assert _strip(out).shape[1:] == tuple(svc.sample_shape)

    with pytest.raises(ValueError):   # cascade: no batch API
        svc.edit_batch({"for_prompt": "a cat", "items": [{"seed": 1}]})
