"""Spatial (H-axis) parallelism over the 8-device virtual CPU mesh: the
sharded U-Net forward and the full DDIM loop match the single-device results
(XLA inserts conv halos, GN stat reductions, attention gathers)."""

import numpy as np

import jax
import jax.numpy as jnp

from loco_edit_tpu.models.adm import ADMUNet
from loco_edit_tpu.models.adm.presets import tiny_test_config
from loco_edit_tpu.parallel.sp import make_sp_mesh, sp_denoiser


def _model():
    cfg = tiny_test_config()
    model = ADMUNet(cfg)
    params = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), 500.0)
    params = jax.tree.map(lambda p: p + 0.02 * (p.size % 7 == 0), params)
    return lambda z, t: model.apply(params, z, t)


def test_sp_forward_matches_single_device():
    eps = _model()
    mesh = make_sp_mesh(8)
    sharded = jax.jit(sp_denoiser(eps, mesh))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3)) * 0.3
    want = np.asarray(jax.jit(eps)(x, 431.0))
    got = np.asarray(sharded(x, 431.0))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sp_full_ddim_loop_matches():
    from loco_edit_tpu.diffusion import LinspaceDDIM, ddim_generate

    eps = _model()
    mesh = make_sp_mesh(8)
    grid = LinspaceDDIM().generation_grid(8)
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    want = np.asarray(jax.jit(lambda z: ddim_generate(eps, z, grid))(x))
    got = np.asarray(jax.jit(lambda z: ddim_generate(
        sp_denoiser(eps, mesh), z, grid))(x))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_sp_basis_extraction_matches():
    """The SP-sharded denoiser composes with the subspace iteration (batch-1
    pullback is exactly the case DP cannot help with)."""
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.editing.pullback import pmp_pullback_fn

    eps = _model()
    mesh = make_sp_mesh(8)
    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3)) * 0.3
    kw = dict(rank=2, min_iter=2, max_iter=3, tol=0.0)
    f1 = pmp_pullback_fn(eps, 0.3, 431.0)
    f8 = pmp_pullback_fn(sp_denoiser(eps, mesh), 0.3, 431.0)
    b1 = subspace_iteration(f1, x, jax.random.key(4), **kw)
    b8 = subspace_iteration(f8, x, jax.random.key(4), **kw)
    np.testing.assert_allclose(np.asarray(b8.s), np.asarray(b1.s), rtol=1e-3)
    # the tiny model's PMP spectrum is near-isotropic, so individual rows are
    # not identifiable — compare the spanned subspaces via their projectors
    v1, v8 = np.asarray(b1.vT), np.asarray(b8.vT)
    p1 = v1.T @ v1
    p8 = v8.T @ v8
    rel = np.linalg.norm(p8 - p1) / np.linalg.norm(p1)
    assert rel < 0.15, f"subspace projector moved by {rel:.3f}"
