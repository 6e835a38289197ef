"""DiffEdit-style mask from prompt-conditional epsilon differences.

Noise x0 to t=500 with a 10-sample noise batch, compare CFG epsilon under the
'for' prompt vs the 'edit' prompt, average over batch and channels, normalize
and threshold (reference mask_diffedit, src/modules/edit.py:1394-1407 — whose
normalize expression has an operator-precedence bug, `mask - mask.min() / ...`;
here the intended min-max normalization is implemented).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def diffedit_mask(eps_fn_for, eps_fn_edit, x0: jnp.ndarray,
                  alphas_cumprod, key: jax.Array, *, t: int = 500,
                  n_noise: int = 10, threshold: float = 0.5) -> jnp.ndarray:
    """eps_fn_for / eps_fn_edit: x, t -> epsilon under the two prompts.
    Returns a boolean mask (1, H, W, 1)."""
    ab = jnp.asarray(alphas_cumprod[t], x0.dtype)
    noise = jax.random.normal(key, (n_noise, *x0.shape[1:]), x0.dtype)
    xt = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise
    e1 = eps_fn_for(xt, jnp.asarray(float(t)))
    e2 = eps_fn_edit(xt, jnp.asarray(float(t)))
    diff = jnp.abs(e1 - e2).mean(axis=0, keepdims=True).mean(axis=-1, keepdims=True)
    d = (diff - diff.min()) / (diff.max() - diff.min() + 1e-12)
    return d >= threshold
