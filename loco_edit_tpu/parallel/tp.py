"""Tensor-parallel parameter sharding.

The reference has no TP (SURVEY.md §2 parallelism table); this is
quality-of-implementation for large checkpoints on small-HBM chips: shard
every large kernel's output-feature dim over the `tp` mesh axis and let
GSPMD propagate/insert collectives. For conv kernels (HWIO) that is dim -1;
for dense kernels (I, O) also dim -1; biases/norm params stay replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_AXIS = "tp"


def tp_param_shardings(params, mesh: Mesh, axis: str = TP_AXIS,
                       min_size: int = 1 << 16):
    """A pytree of NamedShardings: kernels with >= min_size elements whose
    last dim divides the tp axis size get P(..., axis); everything else is
    replicated."""
    tp = mesh.shape[axis]

    def leaf(p):
        if (p.ndim >= 2 and p.size >= min_size and p.shape[-1] % tp == 0):
            spec = [None] * (p.ndim - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, params)


def shard_params_tp(params, mesh: Mesh, axis: str = TP_AXIS,
                    min_size: int = 1 << 16):
    shardings = tp_param_shardings(params, mesh, axis, min_size)
    return jax.tree.map(jax.device_put, params, shardings)


def tp_fraction_sharded(params, mesh: Mesh, axis: str = TP_AXIS,
                        min_size: int = 1 << 16) -> float:
    """Fraction of parameter elements that end up sharded (sanity metric)."""
    tp = mesh.shape[axis]
    tot = shard = 0
    for p in jax.tree.leaves(params):
        tot += p.size
        if p.ndim >= 2 and p.size >= min_size and p.shape[-1] % tp == 0:
            shard += p.size
    return shard / max(tot, 1)
