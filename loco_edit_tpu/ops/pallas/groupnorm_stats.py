"""Pallas TPU kernel: one-pass GroupNorm statistics.

Profiling the 256px U-Net (BENCH.md) shows the dominant remaining cost is the
GN statistics: XLA runs TWO convert+reduce passes over each activation tensor
(sum and sum-of-squares). This kernel computes both in ONE pass: the grid
iterates (batch, row-tiles) with the (1, C) accumulators resident in VMEM
across the row-tile axis (the standard revisited-output accumulation
pattern), halving GN's HBM traffic. Channels stay on the lane axis throughout.

MEASURED OUTCOME (v5-lite, 256px P2 U-Net, batch 9): 65 ms/step vs 47.7 ms
for the XLA path — XLA fuses the two convert+reduce passes into surrounding
producer fusions, which an opaque pallas_call prevents; the one-pass saving
doesn't recover that. The kernel is therefore OPT-IN (LOCO_ENABLE_PALLAS_GN=1)
and kept as validated infrastructure for shapes/hardware where it wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, s_ref, ss_ref):
    # full (B, C) accumulators stay resident across the whole grid (constant
    # index_map); each program accumulates into its batch row. TPU grid
    # execution is sequential, so read-modify-write is race-free.
    i = pl.program_id(0)
    j = pl.program_id(1)
    xa = x_ref[0].astype(jnp.float32)          # (tile_h, W, C)
    s_part = jnp.sum(xa, axis=(0, 1))[None]    # (1, C)
    ss_part = jnp.sum(xa * xa, axis=(0, 1))[None]

    @pl.when((i == 0) & (j == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        ss_ref[...] = jnp.zeros_like(ss_ref)

    s_ref[pl.ds(i, 1), :] = s_ref[pl.ds(i, 1), :] + s_part
    ss_ref[pl.ds(i, 1), :] = ss_ref[pl.ds(i, 1), :] + ss_part


@jax.custom_jvp
def groupnorm_stats(x: jnp.ndarray):
    """x: (B, H, W, C) -> (sum, sumsq) each (B, C) float32, one HBM pass.

    custom_jvp: the edit algebra linearizes/transposes THROUGH GroupNorm
    (pallas_call has no autodiff rules); the tangents of these sums are plain
    linear XLA reductions, so JVP/VJP sweeps stay differentiable while the
    primal uses the fused kernel."""
    return _groupnorm_stats_impl(x)


@groupnorm_stats.defjvp
def _groupnorm_stats_jvp(primals, tangents):
    (x,) = primals
    (x_dot,) = tangents
    out = _groupnorm_stats_impl(x)
    axes = (1, 2)
    s_dot = jnp.sum(x_dot.astype(jnp.float32), axis=axes)
    ss_dot = jnp.sum(2.0 * x.astype(jnp.float32) * x_dot.astype(jnp.float32),
                     axis=axes)
    return out, (s_dot, ss_dot)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def _groupnorm_stats_impl(x: jnp.ndarray, tile_h: int = 0):
    b, h, w, c = x.shape
    if tile_h == 0:
        # fit the tile in ~4MB of VMEM (bf16) with headroom
        budget = (4 << 20) // (w * c * x.dtype.itemsize)
        tile_h = max(1, min(h, budget))
        while h % tile_h:
            tile_h -= 1
    grid = (b, h // tile_h)
    s, ss = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_h, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * x.size, bytes_accessed=x.size * x.dtype.itemsize,
            transcendentals=0),
    )(x)
    return s, ss


def stats_supported(x: jnp.ndarray) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    return c % 128 == 0 and (w * c * x.dtype.itemsize) <= (4 << 20)
