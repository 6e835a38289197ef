"""--verify_load (the day-1 real-checkpoint verifier) on synthetic
state_dicts: conversion + strict coverage + forward + torch oracle must all
run and the oracle diff must be at converter-golden levels."""

import re
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _ref_stubs import install_reference_path  # noqa: E402

install_reference_path()
sys.path.insert(0, "/root/reference/src/models")

from loco_edit_tpu.cli.verify_load import (  # noqa: E402
    _verify_adm,
    _verify_ddpm,
    verify_checkpoint,
)
from loco_edit_tpu.models.adm.config import ADMConfig  # noqa: E402
from loco_edit_tpu.models.ddpm import DDPMConfig  # noqa: E402


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


ADM_CFG = ADMConfig(image_size=32, in_channels=3, model_channels=32,
                    out_channels=6, num_res_blocks=1, attention_ds=(2,),
                    channel_mult=(1, 2), num_classes=None, num_heads=1,
                    num_head_channels=16, num_heads_upsample=-1,
                    use_scale_shift_norm=True, resblock_updown=True,
                    learn_sigma=True)

DDPM_CFG = DDPMConfig(resolution=32, in_channels=3, out_ch=3, ch=32,
                      ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(16,),
                      dropout=0.0, resamp_with_conv=True)


def _diff_of(rep):
    m = re.search(r"max_abs_diff=([0-9.e+-]+)", rep["oracle"])
    assert m, f"no oracle diff in {rep['oracle']!r}"
    return float(m.group(1))


def _adm_checkpoint(tmp_path):
    from guided_diffusion.unet import UNetModel

    ref = UNetModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=1, num_head_channels=16,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=False)
    gen = torch.Generator().manual_seed(0)
    sd = {k: torch.randn(v.shape, generator=gen) * 0.05
          for k, v in ref.state_dict().items()}
    p = str(tmp_path / "adm.pt")
    torch.save(sd, p)
    return p


def test_verify_adm_with_oracle(tmp_path):
    p = _adm_checkpoint(tmp_path)
    rep = _verify_adm(p, "", cfg=ADM_CFG)
    assert "finite" in rep["forward"]
    assert _diff_of(rep) < 5e-4


def test_verify_ddpm_with_oracle(tmp_path):
    from ddpm.diffusion import DDPM

    config = _NS(model=_NS(ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=2,
                           attn_resolutions=[16], dropout=0.0, in_channels=3,
                           resamp_with_conv=True),
                 data=_NS(image_size=32))
    ref = DDPM(config)
    gen = torch.Generator().manual_seed(1)
    sd = {k: torch.randn(v.shape, generator=gen) * 0.05
          for k, v in ref.state_dict().items()}
    p = str(tmp_path / "ddpm.pt")
    torch.save(sd, p)
    rep = _verify_ddpm(p, "", cfg=DDPM_CFG)
    assert rep["naming"] == "sdedit"
    assert _diff_of(rep) < 5e-4


def test_verify_checkpoint_dispatch_and_bad_family(tmp_path, capsys):
    p = _adm_checkpoint(tmp_path)
    args = _NS(verify_load="adm", checkpoint_path=p, model_name="",
               no_oracle=True)
    rep = verify_checkpoint(args, cfg=ADM_CFG)
    assert rep["ok"] and rep["checkpoint"] == p
    assert '"family": "adm"' in capsys.readouterr().out

    with pytest.raises(SystemExit):
        verify_checkpoint(_NS(verify_load="nope", checkpoint_path=p))


def test_cli_flag_reaches_verifier(monkeypatch, tmp_path):
    """--verify_load on the main CLI short-circuits into the verifier."""
    from loco_edit_tpu.cli import main as climain

    seen = {}
    monkeypatch.setattr(
        "loco_edit_tpu.cli.verify_load.verify_checkpoint",
        lambda args, cfg=None: seen.update(fam=args.verify_load) or {"ok": True})
    climain.main(["--verify_load", "adm", "--checkpoint_path", "x.pt"])
    assert seen["fam"] == "adm"


def test_classify_state_dict_fingerprints():
    from loco_edit_tpu.cli.verify_load import classify_state_dict as c

    assert c({"vision_encoder.patch_embed.projection.weight": 0}) == "sam"
    assert c({"lins.0.model.1.weight": 0}) == "lpips"
    assert c({"lin0.model.1.weight": 0}) == "lpips"
    assert c({"input_blocks.0.0.weight": 0, "time_embed.0.weight": 0}) == "adm"
    assert c({"temb.dense.0.weight": 0, "conv_in.weight": 0}) == "ddpm"
    assert c({"decoder.conv_in.weight": 0, "quant_conv.weight": 0}) == "sd_vae"
    assert c({"down_blocks.0.resnets.0.conv1.weight": 0,
              "encoder_hid_proj.weight": 0}) == "ifm"
    assert c({"down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight": 0,
              "time_embedding.linear_1.weight": 0}) == "sd_unet"
    assert c({"down_blocks.0.resnets.0.conv1.weight": 0,
              "time_embedding.linear_1.weight": 0}) == "ddpm"
    assert c({"completely.unknown.key": 0}) is None


def test_verify_all_sweep(tmp_path, capsys):
    """--verify_load all over a mixed weights root: a loadable SAM
    save_pretrained dir verifies with its torch oracle; an unfittable
    checkpoint records ok:false without aborting; an unrecognized file is
    skipped; the report aggregates all three."""
    from transformers import SamConfig, SamModel, SamVisionConfig

    from loco_edit_tpu.cli.verify_load import verify_checkpoint

    root = tmp_path / "weights"
    root.mkdir()
    # 1. tiny SAM save_pretrained directory (full success path + oracle)
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
    SamModel(cfg).eval().save_pretrained(str(root / "sam_tiny"))
    # 2. ADM-named checkpoint whose tiny geometry fits NO production preset
    torch.save({k: torch.zeros(1) for k in
                ("input_blocks.0.0.weight", "time_embed.0.weight")},
               str(root / "adm_broken.pt"))
    # 3. unrecognized fingerprint
    torch.save({"mystery.weight": torch.zeros(1)}, str(root / "junk.pt"))

    args = _NS(verify_load="all", checkpoint_path=str(root), model_name="")
    rep = verify_checkpoint(args)
    capsys.readouterr()
    assert rep["found"] == 3 and rep["checked"] == 2
    assert rep["ok"] is False          # the broken ADM item fails
    by = {r["checkpoint"]: r for r in rep["reports"]}
    sam_item = by[str(root / "sam_tiny")]
    assert sam_item["ok"] and "max_abs_diff" in sam_item["oracle"]
    assert float(sam_item["oracle"].split("max_abs_diff=")[1]) < 5e-4
    adm_item = by[str(root / "adm_broken.pt")]
    assert adm_item["ok"] is False and "no ADM preset fits" in adm_item["error"]
    assert by[str(root / "junk.pt")]["skipped"]
