from loco_edit_tpu.models.ddpm.unet import DDPMConfig, DDPMUNet, ddpm_timestep_embedding
from loco_edit_tpu.models.ddpm.convert import (
    convert_ddpm_state_dict,
    convert_diffusers_unet2d_state_dict,
)
from loco_edit_tpu.models.ddpm.loader import load_ddpm_denoiser, DDPM_PRESETS

__all__ = [
    "DDPMConfig",
    "DDPMUNet",
    "ddpm_timestep_embedding",
    "convert_ddpm_state_dict",
    "convert_diffusers_unet2d_state_dict",
    "load_ddpm_denoiser",
    "DDPM_PRESETS",
]
