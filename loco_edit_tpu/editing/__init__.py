from loco_edit_tpu.editing.pullback import (EditBasis, dual_subspace_iteration,
                                            subspace_iteration)
from loco_edit_tpu.editing.nullspace import null_space_project, normalize_rows
from loco_edit_tpu.editing.walk import x_space_guidance_strip
from loco_edit_tpu.editing.directions import save_directions, load_directions, mask_cache_tag

__all__ = [
    "EditBasis",
    "subspace_iteration",
    "dual_subspace_iteration",
    "null_space_project",
    "normalize_rows",
    "x_space_guidance_strip",
    "save_directions",
    "load_directions",
    "mask_cache_tag",
]
