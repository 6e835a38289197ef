from loco_edit_tpu.models.base import Denoiser

__all__ = ["Denoiser"]
