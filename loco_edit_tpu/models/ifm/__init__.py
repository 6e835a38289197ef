from loco_edit_tpu.models.ifm.unet import IFUNet, IFUNetConfig

__all__ = ["IFUNet", "IFUNetConfig"]
