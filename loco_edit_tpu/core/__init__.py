from loco_edit_tpu.core.rng import RngStream, seed_everything
from loco_edit_tpu.core.mesh import make_mesh, local_mesh, PROBE_AXIS, DATA_AXIS
from loco_edit_tpu.core.cache import enable_compile_cache

__all__ = [
    "enable_compile_cache",
    "RngStream",
    "seed_everything",
    "make_mesh",
    "local_mesh",
    "PROBE_AXIS",
    "DATA_AXIS",
]
