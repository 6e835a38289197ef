"""Normalization ops.

The ADM family always normalizes in float32 regardless of compute dtype
(GroupNorm32, reference src/models/guided_diffusion/nn.py:17-19, 32 groups,
eps 1e-5). On TPU the bandwidth-bound GroupNorm+SiLU prologue is a fusion
target; the Pallas kernel lives in ops/pallas and this wrapper picks it when
profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_f32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of an NHWC/N..C tensor, computed
    in float32 and cast back to x.dtype."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    b = xf.shape[0]
    c = xf.shape[-1]
    spatial = xf.shape[1:-1]
    g = num_groups
    xg = xf.reshape(b, -1, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(b, *spatial, c)
    xf = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)
