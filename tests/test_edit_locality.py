"""The method's core claim, tested end-to-end: null-space-projected edit
directions change the PMP output INSIDE the mask while suppressing change
OUTSIDE it (first-order), relative to an unprojected/random direction —
on a real (tiny, random-weight) U-Net, weights-agnostic because the
projection removes the top complement-Jacobian components by construction."""

import numpy as np

import jax
import jax.numpy as jnp

from loco_edit_tpu.editing import null_space_project, subspace_iteration
from loco_edit_tpu.editing.pullback import pmp_pullback_fn
from loco_edit_tpu.models.adm import ADMUNet
from loco_edit_tpu.models.adm.presets import tiny_test_config


def test_null_projection_suppresses_offmask_change():
    cfg = tiny_test_config()
    model = ADMUNet(cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x0, 500.0)
    params = jax.tree.map(lambda p: p + 0.02, params)
    eps_fn = lambda z, t: model.apply(params, z, t)  # noqa: E731
    f = pmp_pullback_fn(eps_fn, 0.3, 600.0)

    xt = jax.random.normal(jax.random.key(1), (1, 32, 32, 3)) * 0.5
    mask = np.zeros((1, 32, 32, 3), bool)
    mask[:, 8:24, 8:24] = True
    m_in = jnp.asarray(mask, jnp.float32)
    m_out = 1.0 - m_in

    basis_mod = subspace_iteration(f, xt, jax.random.key(2), rank=2,
                                   mask=m_in, min_iter=4, max_iter=8, tol=1e-5)
    basis_null = subspace_iteration(f, xt, jax.random.key(3), rank=6,
                                    mask=m_out, min_iter=4, max_iter=8, tol=1e-5)
    v_proj = null_space_project(basis_mod.vT, basis_null.vT, 6)[0]
    v_raw = basis_mod.vT[0] / jnp.linalg.norm(basis_mod.vT[0])

    def offmask_ratio(v):
        eps = 1e-2
        dv = eps * v.reshape(xt.shape).astype(xt.dtype)
        delta = f(xt + dv) - f(xt)
        inside = float(jnp.linalg.norm(delta * m_in))
        outside = float(jnp.linalg.norm(delta * m_out))
        return outside / max(inside, 1e-12)

    r_proj = offmask_ratio(v_proj)
    r_raw = offmask_ratio(v_raw)
    # the projected direction must leak less outside the mask per unit of
    # inside change than the unprojected top direction
    assert r_proj < r_raw, (r_proj, r_raw)
    # and the projected edit must still do something inside the mask
    dv = 1e-2 * v_proj.reshape(xt.shape).astype(xt.dtype)
    assert float(jnp.linalg.norm((f(xt + dv) - f(xt)) * m_in)) > 0
