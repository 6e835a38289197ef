"""T2I CLI dispatch with tiny monkeypatched model bundles (full-size SD
random-init is too heavy for CPU CI; the engines themselves are tested in
test_pipeline_{sd,lcm,if}.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.models.sd import SDUNet, VAEConfig, VAEDecoder, sd_preset
from loco_edit_tpu.models.sd.text import fake_prompt_encoder
from loco_edit_tpu.models.sd.vae import encode_sample

TINY = sd_preset("tiny")


def _tiny_sd_bundle(args, lcm=False):
    cfg = TINY if not lcm else TINY.__class__(
        **{**TINY.__dict__, "time_cond_proj_dim": 16})
    unet = SDUNet(cfg)
    vae_cfg = VAEConfig(sample_size=16, block_out_channels=(32, 64),
                        layers_per_block=1)
    dec = VAEDecoder(vae_cfg)
    z = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    ex = (z, 500.0, ctx, 6.5) if lcm else (z, 500.0, ctx)
    pu = jax.jit(unet.init)(jax.random.key(0), *ex)
    pu = jax.tree.map(lambda p: p + 0.01, pu)
    pd = jax.jit(dec.init)(jax.random.key(1), z)
    bundle = {
        "decode": lambda zz: dec.apply(pd, zz),
        "encode": lambda x, key: x[:, ::2, ::2, :1].repeat(4, -1),
        "prompt_encoder": fake_prompt_encoder(cfg.cross_attention_dim, seq=7),
        "latent_shape": (8, 8, 4),
    }
    if lcm:
        bundle["unet_apply"] = lambda zz, t, c, w: unet.apply(pu, zz, t, c, w)
    else:
        bundle["unet_apply"] = lambda zz, t, c: unet.apply(pu, zz, t, c)
    return bundle


def test_cli_lcm_dispatch(tmp_path, monkeypatch):
    import loco_edit_tpu.models.t2i_registry as reg
    from loco_edit_tpu.cli.main import main

    monkeypatch.setattr(reg, "load_sd_bundle", _tiny_sd_bundle)
    main(["--model_name", "LCM_tiny", "--dataset_name", "Random",
          "--for_prompt", "a man", "--edit_prompt", "a man with glasses",
          "--guidance_scale", "7.5", "--num_inference_steps", "4",
          "--edit_t_idx", "2", "--pca_rank", "1", "--pca_rank_null", "2",
          "--null_space_projection", "false", "--use_mask", "false",
          "--x_space_guidance_scale", "5.0", "--x_space_guidance_num_step", "1",
          "--vis_num", "1", "--run_edit_null_space_projection_zt", "true",
          "--seed", "3", "--result_folder", str(tmp_path)])
    pngs = [f for root, _, fs in os.walk(tmp_path) for f in fs
            if f.endswith(".png")]
    assert pngs, "LCM CLI produced no images"


def test_cli_sd_dispatch(tmp_path, monkeypatch):
    import loco_edit_tpu.models.t2i_registry as reg
    from loco_edit_tpu.cli.main import main

    monkeypatch.setattr(reg, "load_sd_bundle", _tiny_sd_bundle)
    main(["--model_name", "stable-diffusion-tiny", "--dataset_name", "Random",
          "--for_prompt", "a cat", "--edit_prompt", "",
          "--guidance_scale", "5.0", "--for_steps", "8", "--inv_steps", "8",
          "--edit_t", "0.7", "--performance_boosting_t", "0",
          "--pca_rank", "1", "--pca_rank_null", "2",
          "--null_space_projection", "false", "--use_mask", "false",
          "--x_space_guidance_scale", "1.0", "--x_space_guidance_num_step", "2",
          "--vis_num", "1", "--run_edit_null_space_projection_zt", "true",
          "--seed", "3", "--result_folder", str(tmp_path)])
    pngs = [f for root, _, fs in os.walk(tmp_path) for f in fs
            if f.endswith(".png")]
    assert pngs, "SD CLI produced no images"


def test_t2i_run_ddim_forward(tmp_path, monkeypatch):
    """--run_ddim_forward on a T2I engine (reference main.py:98-99 dispatches
    it per engine as a model-load sanity check)."""
    import os

    monkeypatch.setenv("LOCO_SD_PRESET", "tiny")
    from loco_edit_tpu.cli.main import main

    main(["--model_name", "LCM_Dreamshaper_v7", "--dataset_name", "Random",
          "--run_ddim_forward", "true", "--num_inference_steps", "2",
          "--for_prompt", "a cat", "--use_mask", "false",
          "--use_yh_custom_scheduler", "false",
          "--result_folder", str(tmp_path), "--seed", "5"])
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if f == "LCMforward.png"]
    assert found
