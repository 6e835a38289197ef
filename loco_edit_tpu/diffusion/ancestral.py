"""Ancestral (DDPM) sampling loop with optional classifier guidance.

Counterpart of the reference's p_sample/p_sample_loop and classifier-guidance
hooks (src/models/guided_diffusion/gaussian_diffusion.py:327-536:
p_mean_variance, condition_mean :356-370, condition_score :371-402,
p_sample_loop :441-536). Scan-compiled; timesteps are integer indices into
the (possibly respaced) schedule.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.diffusion.losses import GaussianDiffusionMath


def p_sample_scan(eps_fn: Callable, x: jnp.ndarray,
                  math_: GaussianDiffusionMath, rng_key: jax.Array,
                  timesteps: np.ndarray | None = None,
                  logvar_frac_fn: Callable | None = None,
                  cond_grad_fn: Callable | None = None,
                  guidance_scale: float = 1.0) -> jnp.ndarray:
    """Sample x0 ~ p(x0 | xT) ancestrally.

    eps_fn(x, t_int_batch) -> eps; logvar_frac_fn(x, t) -> learned variance
    fraction in [-1, 1] (None = fixed posterior variance); cond_grad_fn(x, t)
    -> grad_x log p(y | x) for classifier guidance: mean shifted by
    variance * scale * grad (reference condition_mean)."""
    n = math_.schedule.num_train_timesteps
    ts = np.arange(n - 1, -1, -1) if timesteps is None else np.asarray(timesteps)

    def body(x, t):
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        eps = eps_fn(x, tb)
        frac = logvar_frac_fn(x, tb) if logvar_frac_fn is not None else None
        mean, logvar, _ = math_.p_mean_logvar(x, tb, eps, model_logvar_frac=frac)
        if cond_grad_fn is not None:
            grad = cond_grad_fn(x, tb)
            mean = mean + jnp.exp(logvar) * guidance_scale * grad
        key = jax.random.fold_in(rng_key, t)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype)
        return mean + nonzero * jnp.exp(0.5 * logvar) * noise, None

    x_final, _ = jax.lax.scan(body, x, jnp.asarray(ts, jnp.int32))
    return x_final
