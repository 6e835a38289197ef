"""Scheduler fidelity tests.

Grid semantics and alpha-bar tables are validated against an independent
torch (CPU) computation of the same definitions, plus algebraic identities
(step-inverse round trip, posterior-sigma closed form).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.diffusion import (
    LinspaceDDIM,
    NoiseSchedule,
    ddim_step,
    ddpm_step_learned_sigma,
    pmp,
)


def test_linear_alphas_cumprod_matches_torch_float64():
    torch = pytest.importorskip("torch")
    betas_t = torch.linspace(1e-4, 0.02, 1000, dtype=torch.float64)
    ab_t = torch.cumprod(1.0 - betas_t, dim=0).numpy()
    sched = NoiseSchedule.linear()
    np.testing.assert_allclose(sched.alphas_cumprod, ab_t, rtol=1e-12)


def test_cosine_schedule_matches_torch():
    torch = pytest.importorskip("torch")
    import math

    timesteps = 1000
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    ab = torch.cos(((x / timesteps) + 0.008) / 1.008 * math.pi * 0.5) ** 2
    ab = ab / ab[0]
    betas = torch.clip(1 - (ab[1:] / ab[:-1]), 0, 0.999)
    sched = NoiseSchedule.cosine(timesteps)
    np.testing.assert_allclose(sched.betas, betas.numpy(), rtol=1e-12)


def test_scaled_linear_schedule_matches_diffusers_formula():
    """SD/LCM checkpoints: betas = linspace(sqrt(b0), sqrt(b1), N)**2
    (diffusers "scaled_linear"); the reference keeps the checkpoint's own
    alphas_cumprod when monkey-patching (utils.py:147-170)."""
    torch = pytest.importorskip("torch")
    betas_t = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                             dtype=torch.float64) ** 2
    ab_t = torch.cumprod(1.0 - betas_t, dim=0).numpy()
    sched = NoiseSchedule.scaled_linear()
    np.testing.assert_allclose(sched.alphas_cumprod, ab_t, rtol=1e-12)
    np.testing.assert_allclose(
        NoiseSchedule.named("scaled_linear").alphas_cumprod, ab_t, rtol=1e-12)


def test_t2i_family_schedule_defaults():
    """Pipeline scheduler defaults must match each checkpoint family's
    training schedule: SD/LCM scaled_linear, IF squaredcos_cap_v2 (1000-entry
    cosine); the uncond cosine keeps the reference's t_max+1 table."""
    from loco_edit_tpu.diffusion.lcm import lcm_grid
    from loco_edit_tpu.diffusion.scheduler import LinspaceDDIM

    sd = LinspaceDDIM(t_max=999, noise_schedule="scaled_linear")
    np.testing.assert_allclose(sd.schedule.alphas_cumprod,
                               NoiseSchedule.scaled_linear().alphas_cumprod)

    iff = LinspaceDDIM(t_max=990, noise_schedule="squaredcos_cap_v2")
    assert iff.schedule.num_train_timesteps == 1000  # diffusers table size
    np.testing.assert_allclose(iff.schedule.alphas_cumprod,
                               NoiseSchedule.cosine(1000).alphas_cumprod)

    uncond_cos = LinspaceDDIM(t_max=990, noise_schedule="cosine")
    assert uncond_cos.schedule.num_train_timesteps == 991  # reference t_max+1

    g = lcm_grid(4)
    want = NoiseSchedule.scaled_linear().alphas_cumprod
    np.testing.assert_allclose(g.alpha_bar, want[g.t.astype(int)], rtol=1e-6)


def test_generation_grid_semantics():
    dd = LinspaceDDIM()
    n = 100
    g = np.linspace(0, 1, n) * 999.0
    grid = dd.generation_grid(n)
    assert len(grid) == n - 1
    # rtol 2e-7: the grid is now BIT-exact to torch's f32 two-ended fma
    # linspace (pinned in test_scheduler_golden.py), which differs from this
    # f64 numpy linspace by up to 1 ulp
    np.testing.assert_allclose(grid.t, g[1:][::-1].astype(np.float32), rtol=2e-7)
    np.testing.assert_allclose(grid.t_next, g[:-1][::-1].astype(np.float32), rtol=2e-7)
    assert grid.t[0] == np.float32(999.0)
    assert grid.t_next[-1] == 0.0
    # alpha-bar is looked up at floor(t)
    ab = dd.schedule.alphas_cumprod
    np.testing.assert_allclose(grid.alpha_bar, ab[grid.t.astype(np.int64)].astype(np.float32))


def test_inversion_grid_stops_one_early_and_shifts():
    dd = LinspaceDDIM()
    n = 100
    g = np.linspace(0, 1, n) * 999.0 + 1e-6
    grid = dd.inversion_grid(n)  # torch-bit-exact grid: 1-ulp vs f64 numpy
    # the reference loop executes n-2 updates (edit.py:2146-2148)
    assert len(grid) == n - 2
    np.testing.assert_allclose(grid.t, g[:-2].astype(np.float32), rtol=2e-7, atol=2e-5)
    np.testing.assert_allclose(grid.t_next, g[1:-1].astype(np.float32), rtol=2e-7, atol=2e-5)
    # final inversion level is g_{n-2}, NOT t_max
    assert abs(float(grid.t_next[-1]) - g[-2]) < 1e-3


def test_nearest_step_index_matches_reference_argmin():
    dd = LinspaceDDIM()
    # edit_t = 0.6 on 100 steps: argmin |t - 600| over descending grid
    idx = dd.nearest_step_index(100, 0.6)
    grid = dd.generation_grid(100)
    assert idx == int(np.argmin(np.abs(grid.t - 600.0)))
    assert abs(float(grid.t[idx]) - 600.0) <= (999.0 / 99.0) / 2 + 1e-3


def test_boost_eta_flags():
    dd = LinspaceDDIM()
    eta = dd.boost_eta_flags(100, 0.2)
    b = dd.nearest_step_index(100, 0.2)
    assert eta[b - 1] == 0.0 and eta[b] == 1.0 and eta[-1] == 1.0
    assert np.all(dd.boost_eta_flags(100, 0.0) == 0.0)


def test_ddim_step_ode_is_algebraically_invertible():
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 3), jnp.float32)
    et = jax.random.normal(jax.random.fold_in(key, 1), x.shape, jnp.float32)
    ab_t, ab_n = 0.3, 0.7
    x_next, _ = ddim_step(x, et, ab_t, ab_n, eta=0.0)
    x_back, _ = ddim_step(x_next, et, ab_n, ab_t, eta=0.0)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)


def test_ddim_step_eta_sigma_closed_form():
    x = jnp.ones((1, 4, 4, 3))
    et = jnp.zeros_like(x)
    noise = jnp.ones_like(x)
    ab_t, ab_n = 0.3, 0.7
    x_next, _ = ddim_step(x, et, ab_t, ab_n, eta=1.0, noise=noise)
    sigma = np.sqrt((1 - ab_t / ab_n) * (1 - ab_n) / (1 - ab_t))
    expected = np.sqrt(ab_n) * (1.0 / np.sqrt(ab_t)) + sigma
    np.testing.assert_allclose(np.asarray(x_next), expected, rtol=1e-6)


def test_ddim_step_eta_zero_matches_no_noise_branch():
    key = jax.random.key(3)
    x = jax.random.normal(key, (1, 8, 8, 3))
    et = jax.random.normal(jax.random.fold_in(key, 7), x.shape)
    a, b = 0.2, 0.9
    x0, _ = ddim_step(x, et, a, b, eta=0.0, noise=jnp.ones_like(x))
    x1, _ = ddim_step(x, et, a, b)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), atol=1e-6)


def test_pmp_definition():
    x = jnp.full((1, 2, 2, 1), 2.0)
    et = jnp.full_like(x, 0.5)
    ab = 0.25
    got = pmp(x, et, ab)
    expected = (2.0 - 0.5 * np.sqrt(0.75)) / 0.5
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_learned_sigma_step():
    x = jnp.full((1, 2, 2, 1), 1.0)
    et = jnp.full_like(x, 0.2)
    logvar = jnp.full_like(x, -2.0)
    noise = jnp.full_like(x, 1.0)
    beta_t, ab_t = 0.01, 0.5
    got = ddpm_step_learned_sigma(x, et, logvar, beta_t, ab_t, noise)
    mean = (1.0 - 0.01 / np.sqrt(0.5) * 0.2) / np.sqrt(0.99)
    np.testing.assert_allclose(np.asarray(got), mean + np.exp(-1.0), rtol=1e-6)


def test_inversion_generation_grids_share_base_points():
    dd = LinspaceDDIM()
    gen = dd.generation_grid(50)
    inv = dd.inversion_grid(50)
    # same underlying linspace points modulo the 1e-6 inversion shift
    np.testing.assert_allclose(np.sort(inv.t_next), np.sort(gen.t)[:-1], atol=1e-3)


def test_fixed_point_inversion_beats_naive_roundtrip():
    """ddim_invert(refine_steps>0): with a NONLINEAR denoiser, the fixed-
    point refinement recovers the exact DDIM inverse, so the matched
    generation pass reconstructs the input far better than the reference's
    explicit approximation (refine_steps=0 must stay bit-identical to the
    plain scan — it is the reference-parity path)."""
    import jax
    import jax.numpy as jnp

    from loco_edit_tpu.diffusion.sampling import ddim_invert, ddim_scan
    from loco_edit_tpu.diffusion.scheduler import TimestepGrid

    dd = LinspaceDDIM()
    inv = dd.inversion_grid(25)
    rev = TimestepGrid(  # exact generation pairing of the inversion grid
        t=inv.t_next[::-1].copy(), t_next=inv.t[::-1].copy(),
        alpha_bar=inv.alpha_bar_next[::-1].copy(),
        alpha_bar_next=inv.alpha_bar[::-1].copy(),
        beta=inv.beta[::-1].copy(), is_inversion=False)

    # modest Lipschitz constant (like a real denoiser locally) so the
    # fixed-point iteration contracts
    w = jnp.asarray(np.random.default_rng(0).normal(
        size=(48, 48)).astype(np.float32)) * 0.08

    def eps(x, t):  # nonlinear in x, t-dependent
        h = jnp.tanh(x.reshape(x.shape[0], -1) @ w) + 0.001 * t
        return h.reshape(x.shape)

    x0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 4, 4, 3)).astype(np.float32))

    naive = ddim_invert(eps, x0, inv)
    np.testing.assert_array_equal(np.asarray(naive),
                                  np.asarray(ddim_scan(eps, x0, inv)))
    err_naive = float(jnp.abs(ddim_scan(eps, naive, rev) - x0).max())

    refined = ddim_invert(eps, x0, inv, refine_steps=8)
    err_ref = float(jnp.abs(ddim_scan(eps, refined, rev) - x0).max())
    assert err_ref < err_naive / 20, (err_ref, err_naive)
