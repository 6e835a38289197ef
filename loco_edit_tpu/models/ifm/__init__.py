from loco_edit_tpu.models.ifm.convert import convert_if_state_dict, infer_if_config
from loco_edit_tpu.models.ifm.presets import if_preset, tiny_if_config
from loco_edit_tpu.models.ifm.unet import IFUNet, IFUNetConfig, TextTimeEmbedding

__all__ = ["IFUNet", "IFUNetConfig", "TextTimeEmbedding", "if_preset",
           "tiny_if_config", "convert_if_state_dict", "infer_if_config"]
