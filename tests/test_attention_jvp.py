"""The memory-lean attention JVP (ops/attention.py `_lean_attention`) must be
differentiation-equivalent to plain autodiff of the einsum path: identical
primal bits, float-roundoff-equal JVP/VJP/linear_transpose in f32, and a
subspace-iteration result within protocol tolerance in bf16 (the rule's whole
point is narrowing the bf16 TANGENT streams; reference precedent: fp16 nets
under f32 SVD, src/modules/edit.py:2435,1653)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.ops.attention import _lean_attention, _xla_attention

B, H, N, D = 2, 3, 64, 32


def _rand(key, i, dtype=jnp.float32):
    return jax.random.normal(jax.random.fold_in(key, i), (B, H, N, D), dtype)


def test_primal_bit_identical():
    key = jax.random.key(0)
    q, k, v = (_rand(key, i) for i in range(3))
    a = jax.jit(_xla_attention)(q, k, v)
    b = jax.jit(_lean_attention)(q, k, v)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_jvp_matches_autodiff_f32():
    key = jax.random.key(1)
    q, k, v = (_rand(key, i) for i in range(3))
    dq, dk, dv = (_rand(key, 10 + i) for i in range(3))
    o1, do1 = jax.jvp(_xla_attention, (q, k, v), (dq, dk, dv))
    o2, do2 = jax.jvp(_lean_attention, (q, k, v), (dq, dk, dv))
    np.testing.assert_allclose(np.asarray(do1), np.asarray(do2),
                               rtol=0, atol=5e-6)


def test_vjp_matches_autodiff_f32():
    key = jax.random.key(2)
    q, k, v = (_rand(key, i) for i in range(3))
    g = _rand(key, 20)
    _, vj1 = jax.vjp(_xla_attention, q, k, v)
    _, vj2 = jax.vjp(_lean_attention, q, k, v)
    for a, b in zip(vj1(g), vj2(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)


def _pullback_closure(att):
    """x drives q/k/v jointly, like the model's shared projections."""
    def f(x):
        return att(x, x * 0.5 + 0.1, jnp.tanh(x))
    return f


def test_linearize_transpose_vmap_probe_pattern():
    """The exact pullback.py pattern: hoisted linearize, vmapped tangent
    probes, vmapped linear_transpose cotangents."""
    key = jax.random.key(3)
    x = _rand(key, 30)
    probes = jax.random.normal(jax.random.fold_in(key, 31), (8, B, H, N, D))
    outs = {}
    for name, att in (("ad", _xla_attention), ("lean", _lean_attention)):
        _, jl = jax.linearize(_pullback_closure(att), x)
        vt = jax.linear_transpose(jl, x)
        u = jax.vmap(jl)(probes)
        outs[name] = (u, jax.vmap(lambda ui: vt(ui)[0])(u))
    for a, b in zip(outs["ad"], outs["lean"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)


def test_subspace_iteration_equivalent_bf16():
    """Protocol-level equivalence in bf16: the extracted subspace and
    singular values of a bf16 attention-bearing map match plain autodiff
    within the iteration's own convergence tolerance (1e-3)."""
    from loco_edit_tpu.editing.pullback import subspace_iteration

    key = jax.random.key(4)
    n, d = 128, 16
    w = jax.random.normal(jax.random.fold_in(key, 40), (n * d * 2,)) * 0.1

    def mk(att):
        def f(x):
            xb = x.astype(jnp.bfloat16).reshape(1, 2, n, d)
            y = att(xb, xb * jnp.bfloat16(0.5), jnp.tanh(xb))
            return (y.reshape(-1).astype(jnp.float32) * w).reshape(x.shape)
        return f

    x = jax.random.normal(jax.random.fold_in(key, 41), (n * d * 2,))
    kws = dict(rank=4, min_iter=9, max_iter=10, tol=0.0, pad_probes=False)
    b1 = subspace_iteration(mk(_xla_attention), x,
                            jax.random.fold_in(key, 42), **kws)
    b2 = subspace_iteration(mk(_lean_attention), x,
                            jax.random.fold_in(key, 42), **kws)
    overlap = np.linalg.svd(np.asarray(b1.vT) @ np.asarray(b2.vT).T,
                            compute_uv=False)
    np.testing.assert_allclose(overlap, 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b2.s), np.asarray(b1.s), rtol=5e-3)


def test_grad_through_scalar_loss():
    """Training-path reverse mode (grad of a scalar) agrees."""
    key = jax.random.key(5)
    x = _rand(key, 50)

    def loss(att, x):
        y = att(x, x, x)
        return jnp.sum(y ** 2)

    g1 = jax.grad(lambda z: loss(_xla_attention, z))(x)
    g2 = jax.grad(lambda z: loss(_lean_attention, z))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=2e-5)


def test_composes_with_remat_policy():
    """The shipped SD family wraps blocks in jax.checkpoint with the
    dots_no_batch policy (models/sd/unet.py) — the lean rule must compose
    with remat under the pullback pattern."""
    key = jax.random.key(7)
    x = _rand(key, 70)
    policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    probes = jax.random.normal(jax.random.fold_in(key, 71), (4, B, H, N, D))
    outs = {}
    for name, att in (("ad", _xla_attention), ("lean", _lean_attention)):
        g = jax.checkpoint(_pullback_closure(att), policy=policy)
        _, jl = jax.linearize(g, x)
        vt = jax.linear_transpose(jl, x)
        u = jax.vmap(jl)(probes)
        outs[name] = (u, jax.vmap(lambda ui: vt(ui)[0])(u))
    for a, b in zip(outs["ad"], outs["lean"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-6)


@pytest.mark.parametrize("seq_kv", [7, 64])
def test_cross_attention_shapes(seq_kv):
    """kv sequence != q sequence (cross-attention) differentiates too."""
    key = jax.random.key(6)
    q = _rand(key, 60)
    k = jax.random.normal(jax.random.fold_in(key, 61), (B, H, seq_kv, D))
    v = jax.random.normal(jax.random.fold_in(key, 62), (B, H, seq_kv, D))
    dq, dk, dv = q * 0.1, k * 0.1, v * 0.1
    _, do1 = jax.jvp(_xla_attention, (q, k, v), (dq, dk, dv))
    _, do2 = jax.jvp(_lean_attention, (q, k, v), (dq, dk, dv))
    np.testing.assert_allclose(np.asarray(do1), np.asarray(do2),
                               rtol=0, atol=5e-6)
