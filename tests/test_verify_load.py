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
