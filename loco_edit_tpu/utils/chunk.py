"""Batch chunking for memory-bound denoise loops.

The reference chunks every sampler loop by --memory_bound and buffers chunks
on the CPU (src/modules/edit.py:723-746, 1450-1475, 2561-2593). On TPU the
equivalent is device-side chunking with the last chunk zero-padded to the
chunk size, so every chunk reuses ONE compiled program (a ragged tail chunk
would trigger a second multi-minute compile through the tunnel).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def map_chunked(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
                chunk: int) -> jnp.ndarray:
    """Apply a batched fn in chunks of `chunk` along axis 0 (0 = no chunking),
    concatenating results. fn must be shape-preserving on the batch axis."""
    x = jnp.asarray(x)
    b = x.shape[0]
    if chunk <= 0 or b <= chunk:
        return fn(x)
    outs = []
    for lo in range(0, b, chunk):
        part = x[lo:lo + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate(
                [part, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        out = fn(part)
        outs.append(out[:chunk - pad] if pad else out)
    return jnp.concatenate(outs, axis=0)
