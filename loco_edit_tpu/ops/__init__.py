from loco_edit_tpu.ops.attention import sdp_attention
from loco_edit_tpu.ops.norms import group_norm_f32

__all__ = ["sdp_attention", "group_norm_f32"]
