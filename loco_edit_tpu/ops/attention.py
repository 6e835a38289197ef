"""Attention ops: one call site for the whole model zoo, with a pure-XLA
einsum path (CPU tests, small token counts) and a Pallas flash-attention path
for TPU (long-token cases, e.g. SD latent 4096 tokens).

Numerics match the ADM convention (reference
src/models/guided_diffusion/unet.py:330-391): pre-scale q and k each by
1/sqrt(sqrt(d)) (stabler in low precision than post-division), softmax in
float32, output cast back to the input dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sdp_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                  backend: str = "auto") -> jnp.ndarray:
    """Scaled dot-product attention.

    q, k, v: (B, H, N, D) — batch, heads, tokens, head dim.
    Returns (B, H, N, D) in q.dtype.
    """
    if backend == "pallas" or (backend == "auto" and _use_pallas(q)):
        from loco_edit_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)


def _use_pallas(q: jnp.ndarray) -> bool:
    # Flash attention pays off for long token counts on real TPUs; the einsum
    # path is already MXU-optimal for the 256-1024 token ADM feature maps.
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    n = q.shape[-2]
    return on_tpu and n >= 1024 and n % 128 == 0 and q.shape[-1] % 128 == 0


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
