from loco_edit_tpu.core.mesh import (
    DATA_AXIS,
    PROBE_AXIS,
    initialize_distributed,
    local_mesh,
    make_mesh,
    replicated,
    shard_leading,
)
from loco_edit_tpu.parallel.checks import replicated_params_checksum

__all__ = [
    "DATA_AXIS",
    "PROBE_AXIS",
    "initialize_distributed",
    "local_mesh",
    "make_mesh",
    "replicated",
    "shard_leading",
    "replicated_params_checksum",
]
