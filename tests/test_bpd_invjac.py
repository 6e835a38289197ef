"""Golden tests for the two formerly-dormant capabilities (VERDICT r2 #9):

- `GaussianDiffusionMath.calc_bpd_loop` vs the reference
  `GaussianDiffusion.calc_bpd_loop` (guided_diffusion/gaussian_diffusion.py:
  838-893) with matched noise draws — full per-timestep VLB sweep, prior
  term, x0/eps MSE ledgers.
- `editing.hspace.inv_jac` vs the reference inv_jac_xt construction
  (ddpm/diffusion.py:347-377): gradient of the perturbed-feature distance,
  which the analytic shortcut must reproduce.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src/models")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from loco_edit_tpu.diffusion.losses import GaussianDiffusionMath  # noqa: E402
from loco_edit_tpu.diffusion.schedule import (  # noqa: E402
    NoiseSchedule,
    alphas_cumprod_from_betas,
)
from loco_edit_tpu.editing.hspace import inv_jac  # noqa: E402

T = 10


def _ref_gd():
    try:
        from guided_diffusion import gaussian_diffusion as gd
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference gaussian_diffusion not importable: {e}")
    betas = np.linspace(1e-4, 0.02, T, dtype=np.float64)
    diff = gd.GaussianDiffusion(
        betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )
    return diff, betas


def test_calc_bpd_loop_matches_reference_with_matched_noise(monkeypatch):
    diff, betas = _ref_gd()
    rng = np.random.default_rng(0)
    x0 = np.tanh(rng.normal(size=(2, 3, 8, 8)) * 0.7).astype(np.float32)
    x0[0, 0, 0, :4] = 1.0     # exercise the saturated-pixel branches of the
    x0[1, 1, 1, :4] = -1.0    # discretized decoder likelihood
    noises = rng.normal(size=(T, 2, 3, 8, 8)).astype(np.float32)

    # the reference draws th.randn_like per step (t = T-1..0); feed it the
    # same sequence our scan consumes
    it = iter(noises)
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.from_numpy(next(it)))

    def model_t(x, t, **kw):
        return 0.2 * x + 0.05 * torch.sin(3.0 * x)

    out_ref = diff.calc_bpd_loop(model_t, torch.from_numpy(x0),
                                 clip_denoised=True)

    math_ = GaussianDiffusionMath(NoiseSchedule(
        betas=betas, alphas_cumprod=alphas_cumprod_from_betas(betas)))

    def model_j(x, t):
        return 0.2 * x + 0.05 * jnp.sin(3.0 * x)

    out = jax.jit(lambda x, nz: math_.calc_bpd_loop(model_j, x, noise=nz))(
        jnp.asarray(x0), jnp.asarray(noises))

    for k in ("vb", "xstart_mse", "mse"):
        np.testing.assert_allclose(np.asarray(out[k]), out_ref[k].numpy(),
                                   rtol=2e-4, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(out["prior_bpd"]),
                               out_ref["prior_bpd"].numpy(), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out["total_bpd"]),
                               out_ref["total_bpd"].numpy(), rtol=2e-4)


def test_calc_bpd_loop_key_path_runs():
    _, betas = _ref_gd()
    math_ = GaussianDiffusionMath(NoiseSchedule(
        betas=betas, alphas_cumprod=alphas_cumprod_from_betas(betas)))
    x0 = np.tanh(np.random.default_rng(1).normal(size=(1, 4, 4, 3))).astype(
        np.float32)
    out = math_.calc_bpd_loop(lambda x, t: 0.1 * x, x0, key=jax.random.key(0))
    assert out["vb"].shape == (1, T)
    assert np.all(np.isfinite(np.asarray(out["total_bpd"])))
    with pytest.raises(ValueError):
        math_.calc_bpd_loop(lambda x, t: 0.1 * x, x0)


def test_inv_jac_linear_map_closed_form():
    """h(x) = W^T x: inv_jac rows must be -normalize(W u) (the reference's
    distance-gradient at the base point is -J^T u / ||u||)."""
    rng = np.random.default_rng(2)
    d_in, d_h, r = 12, 6, 3
    W = rng.normal(size=(d_in, d_h)).astype(np.float32)
    x = rng.normal(size=(d_in,)).astype(np.float32)
    u = rng.normal(size=(r, d_h)).astype(np.float32)

    got = np.asarray(inv_jac(lambda z: z @ W, jnp.asarray(x), jnp.asarray(u)))
    want = -(u @ W.T)
    want /= np.linalg.norm(want, axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inv_jac_matches_reference_distance_gradient():
    """Nonlinear h: the analytic shortcut equals the reference construction
    — grad_x ||(h + eps*u) - h(x)|| at the base x, row-normalized
    (ddpm/diffusion.py:368-377) — for any perturbation size."""
    rng = np.random.default_rng(3)
    d_in = 10
    A = rng.normal(size=(d_in, d_in)).astype(np.float32) * 0.4

    def h_fn(z):
        return jnp.tanh(z @ A) + 0.3 * z**2

    x = jnp.asarray(rng.normal(size=(d_in,)).astype(np.float32) * 0.5)
    u = jnp.asarray(rng.normal(size=(2, d_in)).astype(np.float32))

    got = np.asarray(inv_jac(h_fn, x, u, perturb_h=0.1))

    h0 = h_fn(x)
    for i in range(2):
        target = h0 + 0.1 * u[i]
        g = jax.grad(lambda z: jnp.linalg.norm(target - h_fn(z)))(x)
        g = np.asarray(g)
        np.testing.assert_allclose(got[i], g / np.linalg.norm(g), atol=1e-5)
