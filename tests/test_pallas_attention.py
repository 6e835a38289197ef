"""Flash attention vs the XLA einsum path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.ops.attention import _xla_attention


def _flash_interpret(q, k, v, block_q=64, block_k=64):
    """Run the pallas kernel in interpreter mode (CPU-safe)."""
    import functools
    import math

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from loco_edit_tpu.ops.pallas.flash_attention import _flash_kernel

    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(math.sqrt(d))
    qf, kf, vf = (t.reshape(b * h, n, d) for t in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=True,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def test_flash_matches_xla_attention():
    key = jax.random.key(0)
    q = jax.random.normal(key, (2, 3, 128, 32), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.float32)
    ref = _xla_attention(q, k, v)
    got = _flash_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_flash_multiblock_online_softmax():
    """More K blocks than one: exercises the running max/sum rescaling."""
    key = jax.random.key(7)
    q = jax.random.normal(key, (1, 2, 256, 16), jnp.float32) * 3.0
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape, jnp.float32) * 3.0
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape, jnp.float32)
    ref = _xla_attention(q, k, v)
    got = _flash_interpret(q, k, v, block_q=64, block_k=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_flash_bf16_io():
    key = jax.random.key(3)
    q = jax.random.normal(key, (1, 1, 128, 32), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), q.shape).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), q.shape).astype(jnp.bfloat16)
    got = _flash_interpret(q, k, v)
    ref = _xla_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
