from loco_edit_tpu.utils.io import save_image_grid, to_uint8

__all__ = ["save_image_grid", "to_uint8"]
