from loco_edit_tpu.models.sd.config import SDUNetConfig, VAEConfig, sd_preset
from loco_edit_tpu.models.sd.unet import SDUNet
from loco_edit_tpu.models.sd.vae import VAEDecoder, VAEEncoder

__all__ = ["SDUNetConfig", "VAEConfig", "sd_preset", "SDUNet",
           "VAEDecoder", "VAEEncoder"]
