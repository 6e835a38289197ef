"""Device-mesh topology.

Replaces the reference's MPI rendezvous + torch.distributed NCCL/gloo backend
(reference src/models/guided_diffusion/dist_util.py:21-42) with JAX-native
SPMD: a `jax.sharding.Mesh` over ICI/DCN, collectives inserted by XLA from
sharding annotations.

Axis conventions used throughout the framework:
  - DATA_AXIS  ("data"):  batch / walk-strip / microbatch axis (DP).
  - PROBE_AXIS ("probe"): probe-vector axis of the Jacobian subspace iteration.
    The reference runs probes serially in host-chunks of 5
    (src/modules/edit.py:2419,2448); here they are one batched, sharded axis —
    the embarrassingly-parallel dimension of the workload.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PROBE_AXIS = "probe"


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a Mesh over `devices` (default: all) with the given axis sizes.

    `axis_sizes` maps axis name -> size; one axis may be -1 to absorb the
    remaining devices. Default: all devices on DATA_AXIS.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {DATA_AXIS: n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def local_mesh(probe: int | None = None) -> Mesh:
    """Single-process mesh: ("data", "probe") with probe innermost (rides ICI)."""
    n = len(jax.devices())
    if probe is None:
        probe = n
    return make_mesh({DATA_AXIS: n // probe, PROBE_AXIS: probe})


def shard_leading(mesh: Mesh, axis: str) -> NamedSharding:
    """Sharding that splits an array's leading dim over `axis`, replicating rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host rendezvous: the TPU-native replacement for the reference's
    MPI bootstrap (dist_util.py:21-42). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
