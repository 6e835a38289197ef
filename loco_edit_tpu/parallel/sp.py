"""Spatial parallelism (the conv-net analog of sequence parallelism).

The reference has no SP (SURVEY.md §5.7: attention spans are tiny), but the
workload's latency-bound paths — batch-1 DDIM inversion of a single 256px
image, and the PMP pullback at batch 1 — cannot use data parallelism. Here
the image HEIGHT axis is sharded across the mesh: XLA's SPMD partitioner
inserts halo exchanges for the 3x3 convs, cross-device reductions for the
f32 GroupNorm statistics, and gathers for the (global) attention levels —
all over ICI, from nothing but sharding annotations. This is the
"pick a mesh, annotate, let XLA insert collectives" recipe.

Numerics are unchanged (validated against the single-device forward on the
virtual CPU mesh in tests/test_sp.py); only the partitioning differs.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SP_AXIS = "sp"


def make_sp_mesh(n_devices: int | None = None,
                 devices: Sequence[jax.Device] | None = None) -> Mesh:
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(SP_AXIS,))


def spatial_sharded(fn: Callable, mesh: Mesh) -> Callable:
    """Wrap a batched NHWC image fn (x, *args) -> NHWC so x is sharded on H
    across the mesh and the result gathered back. The wrapped fn stays
    jittable; XLA partitions every internal conv/norm/attention op.

    H must be divisible by the mesh size times the deepest downsampling
    factor for an even partition (256px over <=8 devices is fine)."""
    x_sh = NamedSharding(mesh, P(None, SP_AXIS, None, None))

    def wrapped(x, *args):
        x = jax.lax.with_sharding_constraint(x, x_sh)
        y = fn(x, *args)
        return jax.lax.with_sharding_constraint(y, x_sh)

    return wrapped


def sp_denoiser(eps_fn: Callable, mesh: Mesh) -> Callable:
    """eps_fn(x, t) with the H axis sharded over `mesh` — drop-in for
    Denoiser.eps_fn so inversion/generation/basis extraction at small batch
    scale across chips instead of leaving them idle."""
    return spatial_sharded(eps_fn, mesh)
