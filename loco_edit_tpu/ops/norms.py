"""Normalization ops.

The ADM family always normalizes in float32 regardless of compute dtype
(GroupNorm32, reference src/models/guided_diffusion/nn.py:17-19, 32 groups,
eps 1e-5). On TPU the bandwidth-bound GroupNorm+SiLU prologue is a fusion
target; the Pallas kernel lives in ops/pallas and this wrapper picks it when
profitable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _use_pallas_stats(x: jnp.ndarray) -> bool:
    # Measured on v5-lite (256px P2 U-Net, batch 9): the one-pass Pallas
    # stats kernel runs the step at 65 ms vs 47.7 ms for the XLA path — XLA
    # fuses the convert+reduce into surrounding producers, which the opaque
    # pallas_call blocks. Kept as opt-in (LOCO_ENABLE_PALLAS_GN=1) for
    # shapes/hardware where one-pass wins; see BENCH.md.
    if not os.environ.get("LOCO_ENABLE_PALLAS_GN"):
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        return False
    if not on_tpu:
        return False
    from loco_edit_tpu.ops.pallas.groupnorm_stats import stats_supported

    return stats_supported(x)


def group_norm_f32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of an NHWC/N..C tensor, computed
    in float32 and cast back to x.dtype.

    Layout note: the naive reshape to (..., groups, C/groups) puts C/groups
    (often 4) on the TPU lane axis and forces full-tensor relayout copies —
    profiled at ~35% of a 256px U-Net step. Instead reduce the spatial axes
    first (channels stay on the lanes), group-reduce the tiny (B, C) stats,
    and normalize elementwise in the native layout."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    cg = c // g
    n = x.size // (b * c) * cg  # elements per group

    # convert inline in each consumer: a materialized f32 copy of the full
    # tensor (shared by the reductions and the normalize) profiles ~2x worse
    # in HBM traffic than convert-fused passes over the bf16 input. On TPU
    # the sum and sum-of-squares collapse into ONE pass via the Pallas stats
    # kernel (ops/pallas/groupnorm_stats.py).
    axes = tuple(range(1, x.ndim - 1))
    if _use_pallas_stats(x):
        from loco_edit_tpu.ops.pallas.groupnorm_stats import groupnorm_stats

        s, ss = groupnorm_stats(x)                                   # (B, C)
    else:
        s = jnp.sum(x.astype(jnp.float32), axis=axes)                # (B, C)
        ss = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes)   # (B, C)
    sg = jnp.sum(s.reshape(b, g, cg), axis=-1)    # (B, G) — tiny
    ssg = jnp.sum(ss.reshape(b, g, cg), axis=-1)
    mean_g = sg / n
    var_g = jnp.maximum(ssg / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # expand group stats back to per-channel (tiny), then broadcast
    mean_c = jnp.repeat(mean_g, cg, axis=1)       # (B, C)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    out = (x.astype(jnp.float32) - mean_c.reshape(shape)) * rstd_c.reshape(shape)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
