"""DDPM model loading by reference model name.

The *_HF names resolve to google/ddpm-ema-* checkpoints in the reference
(src/utils/utils.py:77-146, MODEL_PATHS in src/configs/paths.py); all share
the classic 256px DDPM architecture. Checkpoints are local files here (torch
.pt in either SDEdit or diffusers naming, or .npz flax params); without one
the model initializes randomly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from loco_edit_tpu.models.base import Denoiser
from loco_edit_tpu.models.ddpm.unet import DDPMConfig, DDPMUNet

_DDPM_256 = dict(resolution=256, in_channels=3, out_ch=3, ch=128,
                 ch_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=2,
                 attn_resolutions=(16,), resamp_with_conv=True)

DDPM_PRESETS: dict[str, dict] = {
    "CelebA_HQ_HF": _DDPM_256,
    "LSUN_church_HF": _DDPM_256,
    "LSUN_bedroom_HF": _DDPM_256,
    "FFHQ_HF": _DDPM_256,
    "CelebA_HQ": _DDPM_256,          # SDEdit YAML config (custom_celeba_ddpm.yml)
    "LSUN_church": _DDPM_256,
    "LSUN_bedroom": _DDPM_256,
}


def ddpm_preset(name: str, dtype=jnp.float32) -> DDPMConfig:
    if name not in DDPM_PRESETS:
        raise ValueError(f"unknown DDPM preset {name!r}")
    return DDPMConfig(dtype=dtype, **DDPM_PRESETS[name])


def load_ddpm_denoiser(model_name: str, checkpoint_path: str = "",
                       dtype=jnp.float32) -> Denoiser:
    import numpy as np

    cfg = ddpm_preset(model_name, dtype)
    model = DDPMUNet(cfg)
    if checkpoint_path:
        if checkpoint_path.endswith((".pt", ".pth", ".ckpt", ".bin")):
            from loco_edit_tpu.models.adm.convert import load_torch_checkpoint
            from loco_edit_tpu.models.ddpm.convert import (
                convert_ddpm_state_dict,
                convert_diffusers_unet2d_state_dict,
            )

            sd = load_torch_checkpoint(checkpoint_path)
            conv = (convert_diffusers_unet2d_state_dict
                    if any(k.startswith("time_embedding.") for k in sd)
                    else convert_ddpm_state_dict)
            params = jax.tree.map(jnp.asarray, conv(sd, cfg))
        elif checkpoint_path.endswith(".npz"):
            import flax

            with np.load(checkpoint_path) as z:
                flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
            params = flax.traverse_util.unflatten_dict(flat)
        else:
            raise ValueError(f"unsupported checkpoint: {checkpoint_path}")
    else:
        x = jnp.zeros((1, cfg.resolution, cfg.resolution, cfg.in_channels))
        params = jax.jit(model.init)(jax.random.key(0), x, 500.0)

    return Denoiser(
        eps_fn=lambda z, t: model.apply(params, z, t),
        sample_shape=(cfg.resolution, cfg.resolution, cfg.in_channels),
        learn_sigma=False, meta={"cfg": cfg, "params": params})
