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
    # Measured on v5-lite at the SD latent shape (B*H=25, N=4096, D=64, bf16):
    # XLA's fused einsum attention runs 4.3 ms vs 11.5 ms for the Pallas flash
    # kernel — at D=64 the flash matmuls use half the MXU lanes and the N^2
    # matrix still fits comfortably, so flash only pays past ~8k tokens where
    # materializing N^2 becomes memory-bound. Auto mode therefore gates on a
    # high token count; pass backend="pallas" to force the kernel.
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    n, d = q.shape[-2], q.shape[-1]
    return on_tpu and n >= 8192 and n % 128 == 0 and d % 8 == 0 and d <= 256


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
