"""Editing-algebra tests: subspace iteration vs exact Jacobian SVD, masked
weighting equivalence, null-space projector algebra, walk strip geometry,
and probe sharding over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from loco_edit_tpu.core.mesh import PROBE_AXIS, make_mesh
from loco_edit_tpu.editing import (
    normalize_rows,
    null_space_project,
    subspace_iteration,
    x_space_guidance_strip,
)

D = 4 * 4 * 3  # flat dimension of the toy state (1,4,4,3)
SHAPE = (1, 4, 4, 3)


def _linear_map_with_gaps(key, d=D):
    """M = U diag(s) V^T with well-separated singular values."""
    ku, kv = jax.random.split(key)
    u, _ = jnp.linalg.qr(jax.random.normal(ku, (d, d)))
    v, _ = jnp.linalg.qr(jax.random.normal(kv, (d, d)))
    s = jnp.array([20.0, 15.0, 11.0, 8.0, 6.0] + [1.0] * (d - 5))
    return u @ jnp.diag(s) @ v.T, s, v


def test_linear_recovers_exact_svd():
    m, s_true, v_true = _linear_map_with_gaps(jax.random.key(0))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jax.random.normal(jax.random.key(1), SHAPE)
    basis = subspace_iteration(f, x, jax.random.key(2), rank=5,
                               min_iter=5, max_iter=40, tol=1e-6)
    # reference semantics: s estimates sqrt(singular values of u^T J) where
    # u = J v, so s ~ sigma (edit.py:2500)
    np.testing.assert_allclose(np.asarray(basis.s), np.asarray(s_true[:5]), rtol=1e-3)
    # each recovered row spans the corresponding true right-singular vector
    overlap = np.abs(np.asarray(basis.vT @ v_true[:, :5]))
    np.testing.assert_allclose(np.diag(overlap), 1.0, atol=1e-3)


def test_nonlinear_matches_jacfwd_svd():
    w1 = jax.random.normal(jax.random.key(3), (D, D)) / np.sqrt(D)
    w2 = jax.random.normal(jax.random.key(4), (D, D)) / np.sqrt(D)
    f = lambda x: (w2 @ jnp.tanh(3.0 * (w1 @ x.reshape(-1)))).reshape(SHAPE)
    x = jax.random.normal(jax.random.key(5), SHAPE) * 0.1
    basis = subspace_iteration(f, x, jax.random.key(6), rank=3,
                               min_iter=10, max_iter=60, tol=1e-7)
    j = jax.jacfwd(lambda z: f(z).reshape(-1))(x).reshape(D, D)
    _, s_true, vt_true = jnp.linalg.svd(j)
    np.testing.assert_allclose(np.asarray(basis.s), np.asarray(s_true[:3]), rtol=2e-2)
    overlap = np.abs(np.asarray(basis.vT) @ np.asarray(vt_true[:3]).T)
    np.testing.assert_allclose(np.diag(overlap), 1.0, atol=2e-2)


def test_mask_weight_equals_masked_function():
    m, _, _ = _linear_map_with_gaps(jax.random.key(7))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    mask = (jax.random.uniform(jax.random.key(8), SHAPE) > 0.5).astype(jnp.float32)
    x = jnp.zeros(SHAPE)
    b1 = subspace_iteration(f, x, jax.random.key(9), rank=4, mask=mask,
                            min_iter=5, max_iter=30, tol=1e-6)
    b2 = subspace_iteration(lambda z: f(z) * mask, x, jax.random.key(9), rank=4,
                            min_iter=5, max_iter=30, tol=1e-6)
    np.testing.assert_allclose(np.asarray(b1.vT), np.asarray(b2.vT), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1.s), np.asarray(b2.s), rtol=1e-5)


def test_probe_chunking_matches_unchunked():
    m, _, _ = _linear_map_with_gaps(jax.random.key(10))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jnp.zeros(SHAPE)
    b1 = subspace_iteration(f, x, jax.random.key(11), rank=5,
                            min_iter=3, max_iter=20, tol=1e-6)
    b2 = subspace_iteration(f, x, jax.random.key(11), rank=5, probe_chunk=2,
                            min_iter=3, max_iter=20, tol=1e-6)
    np.testing.assert_allclose(np.asarray(b1.vT), np.asarray(b2.vT), atol=1e-5)


def test_convergence_early_exit():
    m, _, _ = _linear_map_with_gaps(jax.random.key(12))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    # rank 5 sits on the designed spectral gap (6.0 vs 1.0): convergence rate
    # (1/6)^2 per sweep, so the loop must exit right after min_iter
    basis = subspace_iteration(f, jnp.zeros(SHAPE), jax.random.key(13), rank=5,
                               min_iter=5, max_iter=50, tol=1e-5)
    assert int(basis.iters) <= 10


def test_null_space_projection_algebra():
    key = jax.random.key(14)
    vt_mod = jax.random.normal(key, (5, D))
    vt_null = normalize_rows(jax.random.normal(jax.random.fold_in(key, 1), (8, D)))
    # orthonormalize null rows so projector algebra is exact
    q, _ = jnp.linalg.qr(vt_null.T)
    vt_null = q.T[:5]
    out = null_space_project(vt_mod, vt_null, rank_null=5)
    # rows are unit norm
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(out, axis=1)), 1.0, rtol=1e-5)
    # rows orthogonal to every null direction
    np.testing.assert_allclose(np.asarray(out @ vt_null.T), 0.0, atol=1e-5)
    # idempotent (re-projection changes nothing)
    out2 = null_space_project(out, vt_null, rank_null=5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def test_walk_strip_geometry():
    xt = jnp.zeros((1, 4, 4, 3))
    vk = jnp.ones((4, 4, 3))
    strip = x_space_guidance_strip(xt, vk, scale=0.5, edit_step=1.0,
                                   num_steps=16, vis_num=4)
    # stride slice 17//4=4 -> k in {0,4,8,12,16}: 5 frames/side, mirrored,
    # center counted once => 9 (matches the reference's xt[::len//vis_num])
    assert strip.shape[0] == 9
    center = strip.shape[0] // 2
    np.testing.assert_allclose(np.asarray(strip[center]), 0.0)
    # extreme frames at +/- 16*0.5
    np.testing.assert_allclose(float(strip[-1, 0, 0, 0]), 8.0)
    np.testing.assert_allclose(float(strip[0, 0, 0, 0]), -8.0)
    # vis_num=1 -> 3 frames: -last, center, +last
    s1 = x_space_guidance_strip(xt, vk, scale=0.5, edit_step=1.0,
                                num_steps=16, vis_num=1)
    assert s1.shape[0] == 3
    np.testing.assert_allclose(float(s1[-1, 0, 0, 0]), 8.0)


def test_probe_sharding_constraint_matches_unsharded():
    """with_sharding_constraint path (the in-graph probe pinning the
    pipelines use) must not change results."""
    mesh = make_mesh({PROBE_AXIS: 8})
    m, _, _ = _linear_map_with_gaps(jax.random.key(21))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jnp.zeros(SHAPE)
    sharding = NamedSharding(mesh, P(PROBE_AXIS))
    kw = dict(rank=8, min_iter=3, max_iter=20, tol=1e-6)
    b_plain = subspace_iteration(f, x, jax.random.key(22), **kw)
    b_shard = jax.jit(lambda z: subspace_iteration(
        f, z, jax.random.key(22), probe_sharding=sharding, **kw).vT)(x)
    np.testing.assert_allclose(np.asarray(b_shard)[:5],
                               np.asarray(b_plain.vT)[:5], atol=1e-4)


def test_probe_sharded_iteration_matches_single_device():
    mesh = make_mesh({PROBE_AXIS: 8})
    m, _, _ = _linear_map_with_gaps(jax.random.key(15))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jnp.zeros(SHAPE)

    run = lambda z: subspace_iteration(f, z, jax.random.key(16), rank=8,
                                       min_iter=3, max_iter=20, tol=1e-6).vT
    vt_single = run(x)

    sharded = jax.jit(run, in_shardings=NamedSharding(mesh, P()),
                      out_shardings=NamedSharding(mesh, P(PROBE_AXIS)))
    vt_sharded = sharded(x)
    # rows 6-8 live in the degenerate sigma=1 subspace (non-unique up to
    # rotation); only the gapped top-5 rows are pointwise comparable.
    np.testing.assert_allclose(np.asarray(vt_sharded)[:5], np.asarray(vt_single)[:5],
                               atol=1e-4)


def test_normalize_rows_zero_row_no_nan():
    """A row annihilated by projection must not become NaN (eps floor)."""
    vt = jnp.stack([jnp.zeros((16,)), jnp.ones((16,))])
    out = normalize_rows(vt)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out)[1]), 1.0, rtol=1e-5)


def test_probe_padding_preserves_top_subspace():
    """pad_probes (TPU sublane-tile rounding, rank 5 -> 8) must return the
    same gapped top singular directions as the exact ragged iteration."""
    m, _, vt_true = _linear_map_with_gaps(jax.random.key(30))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jnp.zeros(SHAPE)
    kw = dict(min_iter=5, max_iter=40, tol=1e-7)
    b_pad = subspace_iteration(f, x, jax.random.key(31), rank=5,
                               pad_probes=True, **kw)
    b_raw = subspace_iteration(f, x, jax.random.key(31), rank=5,
                               pad_probes=False, **kw)
    assert b_pad.vT.shape == (5, D) and b_pad.s.shape == (5,)
    align_true = np.abs(np.sum(
        np.asarray(b_pad.vT) * np.asarray(vt_true)[:, :5].T, axis=1))
    np.testing.assert_allclose(align_true, 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b_pad.s), np.asarray(b_raw.s),
                               rtol=1e-3)


def test_dual_iteration_matches_two_separate_runs():
    """Fused modify+null extraction (dual_subspace_iteration) equals two
    solo subspace_iteration calls at a fixed sweep budget — including the
    probe-padding path both would take on TPU (forced on here via
    pad_probes=True so the tile logic is exercised on CPU)."""
    from loco_edit_tpu.editing import dual_subspace_iteration

    m, _, _ = _linear_map_with_gaps(jax.random.key(20))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jax.random.normal(jax.random.key(21), SHAPE) * 0.1
    mask = (jax.random.uniform(jax.random.key(22), SHAPE) > 0.6).astype(jnp.float32)
    ka, kb = jax.random.key(23), jax.random.key(24)
    kw = dict(min_iter=6, max_iter=6, tol=0.0)  # fixed budget -> exact match

    for pad in (False, True):
        ba, bb = dual_subspace_iteration(
            f, x, ka, kb, rank_a=5, rank_b=5, mask_a=mask, mask_b=1.0 - mask,
            pad_probes=pad, **kw)
        sa = subspace_iteration(f, x, ka, rank=5, mask=mask,
                                pad_probes=pad, **kw)
        sb = subspace_iteration(f, x, kb, rank=5, mask=1.0 - mask,
                                pad_probes=pad, **kw)
        for fused, solo in ((ba, sa), (bb, sb)):
            np.testing.assert_allclose(np.asarray(fused.vT),
                                       np.asarray(solo.vT), atol=1e-5)
            np.testing.assert_allclose(np.asarray(fused.s),
                                       np.asarray(solo.s), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(fused.u),
                                       np.asarray(solo.u), atol=1e-5)


def test_dual_iteration_probe_chunking_matches():
    from loco_edit_tpu.editing import dual_subspace_iteration

    m, _, _ = _linear_map_with_gaps(jax.random.key(25))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jnp.zeros(SHAPE)
    mask = (jax.random.uniform(jax.random.key(26), SHAPE) > 0.4).astype(jnp.float32)
    ka, kb = jax.random.key(27), jax.random.key(28)
    kw = dict(rank_a=3, rank_b=4, mask_a=mask, mask_b=1.0 - mask,
              min_iter=4, max_iter=4, tol=0.0, pad_probes=False)
    b1 = dual_subspace_iteration(f, x, ka, kb, **kw)
    b2 = dual_subspace_iteration(f, x, ka, kb, probe_chunk=3, **kw)
    for u1, u2 in zip(b1, b2):
        np.testing.assert_allclose(np.asarray(u1.vT), np.asarray(u2.vT),
                                   atol=1e-5)


def test_dual_iteration_probe_sharded_matches_unsharded():
    """The fused dual extraction under probe sharding (flattened 2R-probe
    axis over the 8-device CPU mesh) agrees with the unsharded fused run
    for both mask groups."""
    from loco_edit_tpu.editing import dual_subspace_iteration

    mesh = make_mesh({PROBE_AXIS: 8})
    sharding = NamedSharding(mesh, P(PROBE_AXIS))
    m, _, _ = _linear_map_with_gaps(jax.random.key(30))
    f = lambda x: (m @ x.reshape(-1)).reshape(SHAPE)
    x = jax.random.normal(jax.random.key(31), SHAPE) * 0.1
    mask = (jax.random.uniform(jax.random.key(32), SHAPE) > 0.5).astype(jnp.float32)
    ka, kb = jax.random.key(33), jax.random.key(34)

    def run(z, ps):
        return dual_subspace_iteration(
            f, x, ka, kb, rank_a=4, rank_b=4, mask_a=mask, mask_b=1.0 - mask,
            min_iter=5, max_iter=5, tol=0.0, pad_probes=True,
            probe_sharding=ps)

    d1 = jax.jit(lambda z: run(z, None))(x)
    ds = jax.jit(lambda z: run(z, sharding))(x)
    for solo, shd in zip(d1, ds):
        np.testing.assert_allclose(np.asarray(shd.vT), np.asarray(solo.vT),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(shd.s), np.asarray(solo.s),
                                   rtol=1e-5)
