"""Pallas TPU flash attention (online-softmax, O(N) memory).

Used for the long-token attention sites of the model zoo (SD latent
self-attention is 4096 tokens at 64x64; the reference leans on xformers
memory-efficient attention there, src/utils/utils.py:221,242,268). Numerics
match ops.sdp_attention: ADM double-sqrt scaling, f32 accumulation/softmax,
output cast to the input dtype.

Layout: inputs (B, H, N, D) are flattened to (B*H, N, D); grid is
(B*H, N/BLOCK_Q); each program streams K/V in BLOCK_K tiles from VMEM with a
running (max, sum, acc) online softmax. Block sizes are 128-aligned for the
MXU; callers guarantee N % BLOCK_Q == 0 (ops.attention gates on it).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    n = k_ref.shape[1]
    nk = n // block_k
    bq = q.shape[0]

    def body(kb, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32) * scale
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jnp.dot(
            p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = BLOCK_Q, block_k: int = BLOCK_K) -> jnp.ndarray:
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    b, h, n, d = q.shape
    if n % block_q or n % block_k:
        raise ValueError(f"token count {n} must divide block sizes")
    scale = 1.0 / math.sqrt(math.sqrt(d))
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=(3 * b * h * n * d + b * h * n * d) * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
