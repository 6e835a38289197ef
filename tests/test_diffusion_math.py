"""Training-math parity: KL/likelihood closed forms, posterior moments,
respacing vs the reference's algorithm, ancestral sampling sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.diffusion.ancestral import p_sample_scan
from loco_edit_tpu.diffusion.losses import (
    GaussianDiffusionMath,
    discretized_gaussian_log_likelihood,
    hybrid_loss,
    normal_kl,
)
from loco_edit_tpu.diffusion.respace import respaced_schedule, space_timesteps
from loco_edit_tpu.diffusion.schedule import NoiseSchedule


def test_normal_kl_closed_form():
    # KL(N(0,1) || N(0,1)) = 0 ; KL(N(1,1) || N(0,1)) = 0.5
    z = jnp.zeros(())
    np.testing.assert_allclose(float(normal_kl(z, z, z, z)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(normal_kl(1.0 + z, z, z, z)), 0.5, rtol=1e-6)
    # torch cross-check
    torch = pytest.importorskip("torch")
    m1, lv1, m2, lv2 = 0.3, -1.2, -0.5, 0.4
    d1 = torch.distributions.Normal(m1, np.exp(lv1 / 2))
    d2 = torch.distributions.Normal(m2, np.exp(lv2 / 2))
    expected = torch.distributions.kl_divergence(d1, d2).item()
    got = float(normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                          jnp.asarray(m2), jnp.asarray(lv2)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_discretized_ll_is_normalized_ish():
    # summing bin probabilities across the quantized range ~ 1
    means = jnp.zeros((1,))
    log_scales = jnp.asarray([np.log(0.3)])
    xs = jnp.linspace(-1, 1, 256)[:, None]
    ll = discretized_gaussian_log_likelihood(xs, means, log_scales)
    total = float(jnp.sum(jnp.exp(ll)))
    assert 0.98 < total < 1.02


def test_posterior_moments_match_bayes():
    sched = NoiseSchedule.linear()
    m = GaussianDiffusionMath(sched)
    t = 500
    ab = sched.alphas_cumprod
    ab_prev = ab[t - 1]
    beta = sched.betas[t]
    x0 = jnp.full((1, 2, 2, 1), 0.5)
    xt = jnp.full((1, 2, 2, 1), -0.2)
    mean, logvar = m.q_posterior_mean_logvar(x0, xt, jnp.asarray([t]))
    expected_mean = (beta * np.sqrt(ab_prev) / (1 - ab[t]) * 0.5
                     + (1 - ab_prev) * np.sqrt(1 - beta) / (1 - ab[t]) * -0.2)
    np.testing.assert_allclose(float(mean[0, 0, 0, 0]), expected_mean, rtol=1e-5)
    expected_var = beta * (1 - ab_prev) / (1 - ab[t])
    np.testing.assert_allclose(float(jnp.exp(logvar[0, 0, 0, 0])), expected_var,
                               rtol=1e-5)


def test_space_timesteps_ddim_syntax_and_sections():
    s = space_timesteps(1000, "ddim100")
    assert len(s) == 100 and 0 in s
    s2 = space_timesteps(100, [10])
    assert len(s2) == 10 and 0 in s2 and 99 in s2


def test_respaced_schedule_consistency():
    sched = NoiseSchedule.linear()
    new, tmap = respaced_schedule(sched, "ddim50")
    assert new.num_train_timesteps == 50 == len(tmap)
    # respaced abar at kept step equals the original abar there
    np.testing.assert_allclose(new.alphas_cumprod,
                               sched.alphas_cumprod[tmap], rtol=1e-10)


def test_hybrid_loss_shapes_and_vb_finite():
    sched = NoiseSchedule.linear()
    m = GaussianDiffusionMath(sched)
    key = jax.random.key(0)
    x0 = jax.random.uniform(key, (4, 8, 8, 3), minval=-1, maxval=1)
    t = jnp.asarray([0, 10, 500, 999])
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    ab = jnp.asarray(sched.alphas_cumprod, jnp.float32)[t][:, None, None, None]
    xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * noise
    eps_pred = noise + 0.1
    frac = jnp.zeros_like(x0)
    losses = hybrid_loss(m, xt, t, noise, eps_pred, frac, x0, vb_weight=0.001)
    assert losses.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(losses)))


def test_p_sample_scan_runs_and_t0_is_deterministic():
    sched, tmap = respaced_schedule(NoiseSchedule.linear(), "ddim25")
    m = GaussianDiffusionMath(sched)
    eps_fn = lambda x, t: 0.1 * x  # noqa: E731
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    out = jax.jit(lambda xx: p_sample_scan(eps_fn, xx, m, jax.random.key(1)))(x)
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


def test_classifier_guidance_shifts_mean():
    sched, _ = respaced_schedule(NoiseSchedule.linear(), "ddim10")
    m = GaussianDiffusionMath(sched)
    eps_fn = lambda x, t: jnp.zeros_like(x)  # noqa: E731
    grad_fn = lambda x, t: jnp.ones_like(x)  # noqa: E731
    x = jnp.zeros((1, 4, 4, 3))
    out_g = p_sample_scan(eps_fn, x, m, jax.random.key(0),
                          cond_grad_fn=grad_fn, guidance_scale=5.0)
    out_n = p_sample_scan(eps_fn, x, m, jax.random.key(0))
    assert float(jnp.mean(out_g)) > float(jnp.mean(out_n))
