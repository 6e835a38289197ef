"""Scan-compiled DDIM sampling / inversion loops.

The reference runs Python loops over timesteps with host<->device buffer
chunking to bound GPU memory (src/modules/edit.py:2544-2593). On TPU the whole
denoising trajectory is one `lax.scan` under jit: a single compiled program,
no host round-trips, grid coefficients baked as trace-time constants.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.diffusion.scheduler import TimestepGrid, ddim_step

# eps_fn(x, t) -> epsilon prediction; x: (B, H, W, C), t: scalar (broadcast to B
# inside the model wrapper), exactly as the reference feeds one shared t per
# batch (src/models/guided_diffusion/unet.py:653-658).
EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_scan(eps_fn: EpsFn, x: jnp.ndarray, grid: TimestepGrid, *,
              eta: np.ndarray | None = None,
              rng_key: jax.Array | None = None,
              return_traj: bool = False) -> jnp.ndarray:
    """Run every executed step of `grid` starting from x.

    eta: optional per-step eta array (e.g. LinspaceDDIM.boost_eta_flags);
    rng_key is required iff any eta > 0.
    """
    s = len(grid)
    if s == 0:
        return (x, x[None][:0]) if return_traj else x
    stochastic = eta is not None and bool(np.any(np.asarray(eta) > 0))
    if stochastic and rng_key is None:
        raise ValueError("rng_key required when eta > 0")
    etas = np.zeros((s,), np.float32) if eta is None else np.asarray(eta, np.float32)

    xs = {
        "t": jnp.asarray(grid.t),
        "ab": jnp.asarray(grid.alpha_bar),
        "ab_next": jnp.asarray(grid.alpha_bar_next),
        "eta": jnp.asarray(etas),
        "step": jnp.arange(s),
    }

    def body(x, step_in):
        et = eps_fn(x, step_in["t"])
        noise = None
        if stochastic:
            key = jax.random.fold_in(rng_key, step_in["step"])
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_next, _ = ddim_step(x, et, step_in["ab"], step_in["ab_next"],
                              eta=step_in["eta"], noise=noise)
        return x_next, (x_next if return_traj else None)

    x_final, traj = jax.lax.scan(body, x, xs)
    return (x_final, traj) if return_traj else x_final


def ddim_generate(eps_fn: EpsFn, xt: jnp.ndarray, grid: TimestepGrid, *,
                  start_idx: int = 0, end_idx: int | None = None,
                  eta: np.ndarray | None = None,
                  rng_key: jax.Array | None = None) -> jnp.ndarray:
    """Denoise from step `start_idx` (inclusive) to `end_idx` (exclusive) of a
    generation grid — the reference's `DDIMforwardsteps` with t_start_idx /
    t_end_idx semantics (src/modules/edit.py:2507-2559), where end_idx=None
    means run to x0."""
    if grid.is_inversion:
        raise ValueError("ddim_generate expects a generation grid")
    end_idx = len(grid) + 1 if end_idx is None or end_idx < 0 else end_idx
    sub = grid.slice(start_idx, min(end_idx, len(grid)))
    e = None if eta is None else np.asarray(eta)[start_idx:min(end_idx, len(grid))]
    return ddim_scan(eps_fn, xt, sub, eta=e, rng_key=rng_key)


def ddim_invert(eps_fn: EpsFn, x0: jnp.ndarray, grid: TimestepGrid, *,
                refine_steps: int = 0) -> jnp.ndarray:
    """DDIM inversion x0 -> xT over an inversion grid (always deterministic);
    the reference's `run_DDIMinversion` loop (src/modules/edit.py:2116-2167).

    refine_steps > 0 turns each step into a fixed-point iteration on the
    implicit exact-inversion equation (the AIDI / ReNoise family of
    techniques; the reference — and refine_steps=0 — uses the standard
    explicit approximation eps(x_t, t)): after the explicit step produces a
    candidate x', the eps the FORWARD pass will actually use at x' (queried
    at the noisier grid timestep t_next, which is where the matched
    generation grid evaluates it) replaces the approximation and the update
    re-runs from x_t. Each iteration costs one extra eps eval per step; at
    convergence the later generation pass retraces the inversion exactly,
    so edits sit on a trajectory that reconstructs the input image."""
    if not grid.is_inversion:
        raise ValueError("ddim_invert expects an inversion grid")
    if refine_steps == 0:
        return ddim_scan(eps_fn, x0, grid)

    xs = {
        "t": jnp.asarray(grid.t),
        "t_next": jnp.asarray(grid.t_next),
        "ab": jnp.asarray(grid.alpha_bar),
        "ab_next": jnp.asarray(grid.alpha_bar_next),
    }

    def body(x, s):
        et = eps_fn(x, s["t"])
        x1, _ = ddim_step(x, et, s["ab"], s["ab_next"])

        def refine(_, x1):
            et = eps_fn(x1, s["t_next"])
            x1, _ = ddim_step(x, et, s["ab"], s["ab_next"])
            return x1

        return jax.lax.fori_loop(0, refine_steps, refine, x1), None

    x_final, _ = jax.lax.scan(body, x0, xs)
    return x_final
