"""Diffusion training losses: KL terms, discretized likelihoods, hybrid VLB.

The TPU-side counterpart of the reference's training math
(src/models/guided_diffusion/losses.py:12-77 and
gaussian_diffusion.py:171-326,744-817): gaussian KL, discretized gaussian
log-likelihood for x0, posterior q(x_{t-1}|x_t,x0), the learned-sigma
interpolation, and the hybrid MSE+VLB objective with stop-gradient on the
mean (the 'detach the mean for the vb term' trick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.diffusion.schedule import NoiseSchedule


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) elementwise in nats (reference losses.py:12-39)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def _approx_std_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of images discretized to 255 bins under a gaussian
    (reference losses.py:50-77); x in [-1, 1]."""
    centered = x - means
    inv_std = jnp.exp(-log_scales)
    plus = _approx_std_normal_cdf(inv_std * (centered + 1.0 / 255.0))
    minus = _approx_std_normal_cdf(inv_std * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(plus, 1e-12, None))
    log_one_minus_cdf_minus = jnp.log(jnp.clip(1.0 - minus, 1e-12, None))
    cdf_delta = plus - minus
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_minus,
                  jnp.log(jnp.clip(cdf_delta, 1e-12, None))))


class GaussianDiffusionMath:
    """Closed-form q/p moments over a NoiseSchedule (host tables, jnp math)."""

    def __init__(self, schedule: NoiseSchedule):
        self.schedule = schedule
        ab = schedule.alphas_cumprod
        ab_prev = np.concatenate([[1.0], ab[:-1]])
        betas = schedule.betas
        self.posterior_variance = betas * (1.0 - ab_prev) / (1.0 - ab)
        self.posterior_log_variance_clipped = np.log(
            np.concatenate([[self.posterior_variance[1]],
                            self.posterior_variance[1:]]))
        self.posterior_mean_coef1 = betas * np.sqrt(ab_prev) / (1.0 - ab)
        self.posterior_mean_coef2 = ((1.0 - ab_prev) * np.sqrt(1.0 - betas)
                                     / (1.0 - ab))
        self._ab = ab
        self._betas = betas

    def _g(self, table, t, like):
        v = jnp.asarray(table, jnp.float32)[t]
        while v.ndim < like.ndim:
            v = v[..., None]
        return v.astype(like.dtype)

    def predict_x0_from_eps(self, xt, t, eps):
        ab = self._g(self._ab, t, xt)
        return (xt - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)

    def q_posterior_mean_logvar(self, x0, xt, t):
        mean = (self._g(self.posterior_mean_coef1, t, xt) * x0
                + self._g(self.posterior_mean_coef2, t, xt) * xt)
        logvar = self._g(self.posterior_log_variance_clipped, t, xt)
        return mean, logvar

    def p_mean_logvar(self, xt, t, eps, model_logvar_frac=None,
                      clip_x0: bool = True):
        """Model p(x_{t-1}|x_t): mean from predicted x0; variance fixed-small
        or the learned interpolation between beta_t and the posterior
        (gaussian_diffusion.py:253-283)."""
        x0 = self.predict_x0_from_eps(xt, t, eps)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, post_logvar = self.q_posterior_mean_logvar(x0, xt, t)
        if model_logvar_frac is None:
            return mean, post_logvar, x0
        min_log = post_logvar
        max_log = jnp.log(self._g(self._betas, t, xt))
        frac = (model_logvar_frac + 1.0) / 2.0
        logvar = frac * max_log + (1.0 - frac) * min_log
        return mean, logvar, x0

    def q_mean_logvar(self, x0, t):
        """Moments of q(x_t | x_0) (gaussian_diffusion.py:171-191)."""
        ab = self._g(self._ab, t, x0)
        return jnp.sqrt(ab) * x0, jnp.log(1.0 - ab)

    def q_sample(self, x0, t, noise):
        ab = self._g(self._ab, t, x0)
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def prior_bpd(self, x0):
        """KL(q(x_T|x_0) || N(0, I)) in bits/dim, per batch element
        (gaussian_diffusion.py:819-835)."""
        t = jnp.full((x0.shape[0],), self._ab.shape[0] - 1, jnp.int32)
        mean, logvar = self.q_mean_logvar(x0, t)
        kl = normal_kl(mean, logvar, 0.0, 0.0)
        return jnp.mean(kl, axis=tuple(range(1, kl.ndim))) / np.log(2.0)

    def calc_bpd_loop(self, model_fn, x0, key=None, *, learned_sigma=False,
                      clip_x0=True, noise=None):
        """Full variational-bound evaluation: one VLB term per training
        timestep, swept T-1..0 (reference calc_bpd_loop,
        gaussian_diffusion.py:838-893). The reference's Python loop of T
        no_grad forwards becomes a single lax.scan program.

        model_fn(xt, t_batch) -> eps, or (eps, logvar_frac) when
        learned_sigma. noise: optional (T, *x0.shape) array (index i holds
        the draw for t = T-1-i), used for deterministic eval / oracle tests;
        otherwise drawn from `key` per step.

        Returns dict(total_bpd (N,), prior_bpd (N,), vb (N, T),
        xstart_mse (N, T), mse (N, T)) — vb[:, j] is the term at t = T-1-j,
        matching the reference's append order.
        """
        if key is None and noise is None:
            raise ValueError("provide key or noise")
        T = self._ab.shape[0]
        n = x0.shape[0]
        red = tuple(range(1, x0.ndim))
        ts = jnp.arange(T - 1, -1, -1)
        xs = {"t": ts}
        if noise is not None:
            xs["noise"] = jnp.asarray(noise)

        def body(_, s):
            t = jnp.full((n,), s["t"], jnp.int32)
            nz = (s["noise"] if noise is not None else
                  jax.random.normal(jax.random.fold_in(key, s["t"]),
                                    x0.shape, x0.dtype))
            xt = self.q_sample(x0, t, nz)
            out = model_fn(xt, t)
            eps, frac = out if learned_sigma else (out, None)
            true_mean, true_logvar = self.q_posterior_mean_logvar(x0, xt, t)
            mean, logvar, x0p = self.p_mean_logvar(
                xt, t, eps, model_logvar_frac=frac, clip_x0=clip_x0)
            kl = jnp.mean(normal_kl(true_mean, true_logvar, mean, logvar),
                          axis=red) / np.log(2.0)
            nll = -discretized_gaussian_log_likelihood(
                x0, mean, 0.5 * logvar)
            nll = jnp.mean(nll, axis=red) / np.log(2.0)
            vb = jnp.where(t == 0, nll, kl)
            xstart_mse = jnp.mean((x0p - x0) ** 2, axis=red)
            # eps recovered from the (possibly clipped) x0 prediction, as the
            # reference's _predict_eps_from_xstart does (:889)
            ab = self._g(self._ab, t, xt)
            eps_back = (xt - jnp.sqrt(ab) * x0p) / jnp.sqrt(1.0 - ab)
            mse = jnp.mean((eps_back - nz) ** 2, axis=red)
            return None, (vb, xstart_mse, mse)

        _, (vb, xm, ms) = jax.lax.scan(body, None, xs)
        vb, xm, ms = (a.T for a in (vb, xm, ms))  # (N, T)
        prior = self.prior_bpd(x0)
        return {"total_bpd": vb.sum(axis=1) + prior, "prior_bpd": prior,
                "vb": vb, "xstart_mse": xm, "mse": ms}

    def vb_term(self, x0_true, xt, t, eps, model_logvar_frac=None):
        """Per-element VLB term L_{t-1} (or L_0 decoder NLL) in bits/dim
        (gaussian_diffusion.py:694-743); the mean is stop-gradiented so the
        vb term only trains the variance (training_losses :788)."""
        true_mean, true_logvar = self.q_posterior_mean_logvar(x0_true, xt, t)
        mean, logvar, _ = self.p_mean_logvar(
            xt, t, eps, model_logvar_frac=model_logvar_frac)
        mean = jax.lax.stop_gradient(mean)
        kl = normal_kl(true_mean, true_logvar, mean, logvar)
        kl = jnp.mean(kl, axis=tuple(range(1, kl.ndim))) / np.log(2.0)
        nll = -discretized_gaussian_log_likelihood(
            x0_true, mean, 0.5 * logvar)
        nll = jnp.mean(nll, axis=tuple(range(1, nll.ndim))) / np.log(2.0)
        return jnp.where(t == 0, nll, kl)


def hybrid_loss(math_: GaussianDiffusionMath, xt, t, noise, eps_pred,
                logvar_frac, x0_true, vb_weight: float = 1.0):
    """MSE on eps + weighted VLB on the learned variance — the reference's
    'mse + vb/1000-ish' hybrid (training_losses, gaussian_diffusion.py:744-817
    with rescale semantics left to the caller). Returns per-sample losses."""
    mse = jnp.mean((eps_pred - noise) ** 2, axis=tuple(range(1, xt.ndim)))
    vb = math_.vb_term(x0_true, xt, t, eps_pred, model_logvar_frac=logvar_frac)
    return mse + vb_weight * vb
