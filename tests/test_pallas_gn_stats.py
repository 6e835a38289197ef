"""Pallas GN-stats kernel: interpret-mode parity vs XLA reductions, plus the
custom JVP/transpose rules the edit algebra depends on."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _stats_interpret(x, tile_h):
    from jax.experimental import pallas as pl

    from loco_edit_tpu.ops.pallas.groupnorm_stats import _stats_kernel

    b, h, w, c = x.shape
    return pl.pallas_call(
        _stats_kernel,
        grid=(b, h // tile_h),
        in_specs=[pl.BlockSpec((1, tile_h, w, c), lambda i, j: (i, j, 0, 0))],
        out_specs=(pl.BlockSpec((b, c), lambda i, j: (0, 0)),
                   pl.BlockSpec((b, c), lambda i, j: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)),
        interpret=True,
    )(x)


def test_stats_match_xla():
    x = jax.random.normal(jax.random.key(0), (2, 8, 4, 16), jnp.float32)
    s, ss = _stats_interpret(x, tile_h=2)
    np.testing.assert_allclose(np.asarray(s), np.asarray(jnp.sum(x, (1, 2))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss),
                               np.asarray(jnp.sum(x * x, (1, 2))), rtol=1e-5)


def test_stats_bf16_accumulates_f32():
    x = (jax.random.normal(jax.random.key(1), (1, 16, 4, 8)) * 3).astype(jnp.bfloat16)
    s, _ = _stats_interpret(x, tile_h=4)
    ref = jnp.sum(x.astype(jnp.float32), (1, 2))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref), rtol=1e-3)


def test_custom_jvp_and_transpose():
    """The tangent rules must match the XLA stats' derivatives and be
    linear-transposable (the subspace iteration transposes them)."""
    from loco_edit_tpu.ops.pallas import groupnorm_stats as gs

    # monkeypatch the impl to the XLA expression so the custom_jvp machinery
    # is exercised on CPU (the primal kernel itself is TPU-only)
    orig = gs._groupnorm_stats_impl
    gs_impl = lambda x: (jnp.sum(x.astype(jnp.float32), (1, 2)),  # noqa: E731
                         jnp.sum(jnp.square(x.astype(jnp.float32)), (1, 2)))
    gs._groupnorm_stats_impl = gs_impl
    try:
        x = jax.random.normal(jax.random.key(2), (1, 4, 4, 8))

        def f(z):
            s, ss = gs.groupnorm_stats(z)
            return jnp.sum(s * 2.0 + ss)

        g_custom = jax.grad(f)(x)

        def f_ref(z):
            s = jnp.sum(z.astype(jnp.float32), (1, 2))
            ss = jnp.sum(jnp.square(z.astype(jnp.float32)), (1, 2))
            return jnp.sum(s * 2.0 + ss)

        g_ref = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                                   rtol=1e-5)

        # linearize + transpose path (what subspace_iteration does)
        y, jvp_lin = jax.linearize(f, x)
        vjp_lin = jax.linear_transpose(jvp_lin, x)
        (g2,) = vjp_lin(jnp.asarray(1.0))
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g_ref), rtol=1e-5)
    finally:
        gs._groupnorm_stats_impl = orig
