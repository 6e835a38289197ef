from loco_edit_tpu.diffusion.schedule import (
    linear_betas,
    cosine_betas,
    alphas_cumprod_from_betas,
    NoiseSchedule,
)
from loco_edit_tpu.diffusion.scheduler import (
    LinspaceDDIM,
    TimestepGrid,
    ddim_step,
    ddpm_step_learned_sigma,
    pmp,
)
from loco_edit_tpu.diffusion.sampling import ddim_generate, ddim_invert

__all__ = [
    "linear_betas",
    "cosine_betas",
    "alphas_cumprod_from_betas",
    "NoiseSchedule",
    "LinspaceDDIM",
    "TimestepGrid",
    "ddim_step",
    "ddpm_step_learned_sigma",
    "pmp",
    "ddim_generate",
    "ddim_invert",
]
