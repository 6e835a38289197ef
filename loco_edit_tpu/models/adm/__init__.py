from loco_edit_tpu.models.adm.config import ADMConfig
from loco_edit_tpu.models.adm.unet import ADMUNet, timestep_embedding
from loco_edit_tpu.models.adm.presets import adm_preset, PRESETS

__all__ = ["ADMConfig", "ADMUNet", "timestep_embedding", "adm_preset", "PRESETS"]
