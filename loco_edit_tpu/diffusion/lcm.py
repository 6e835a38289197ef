"""Latent Consistency Model scheduler (few-step).

The LCM engine keeps the diffusers LCMScheduler (the reference runs LCM with
use_yh_custom_scheduler=False, scripts/main_T2I_LCM_null_space_projection.sh),
so this is its pure-JAX counterpart:

  - timestep selection: k = train_steps/original_steps (=20); origin grid
    (arange(1..50)*20 - 1), reversed, strided by origin//n -> e.g.
    [999, 759, 519, 279] for n=4.
  - consistency step: denoised = c_out * x0_pred + c_skip * sample with
    boundary scalings from scaled_t = t * timestep_scaling (10), sigma_data
    0.5; then re-noise to the next grid point except at the last step.
  - the PMP analogue for the edit algebra is `denoised` itself (the engine's
    get_x0 takes the second step output, reference edit.py:206-247).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.diffusion.schedule import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class LCMGrid:
    t: np.ndarray             # (S,) int timesteps, descending
    alpha_bar: np.ndarray     # (S,)
    alpha_bar_prev: np.ndarray  # (S,) next grid point's abar (last = own)
    c_skip: np.ndarray        # (S,)
    c_out: np.ndarray         # (S,)

    def __len__(self) -> int:
        return int(self.t.shape[0])


def lcm_grid(num_inference_steps: int, schedule: NoiseSchedule | None = None,
             original_inference_steps: int = 50, timestep_scaling: float = 10.0,
             sigma_data: float = 0.5) -> LCMGrid:
    # the LCM Dreamshaper checkpoint's scheduler is scaled_linear
    # (sqrt-space linspace, squared) — not a plain beta linspace
    schedule = schedule or NoiseSchedule.scaled_linear(
        beta_start=0.00085, beta_end=0.012, timesteps=1000)
    train_steps = schedule.num_train_timesteps
    k = train_steps // original_inference_steps
    origin = np.arange(1, original_inference_steps + 1) * k - 1
    skip = original_inference_steps // num_inference_steps
    t = origin[::-1][::skip][:num_inference_steps].astype(np.int64)

    ab = schedule.alphas_cumprod[t].astype(np.float32)
    ab_prev = np.concatenate([ab[1:], ab[-1:]])
    scaled = t.astype(np.float64) * timestep_scaling
    c_skip = (sigma_data**2 / (scaled**2 + sigma_data**2)).astype(np.float32)
    c_out = (scaled / np.sqrt(scaled**2 + sigma_data**2)).astype(np.float32)
    return LCMGrid(t=t, alpha_bar=ab, alpha_bar_prev=ab_prev,
                   c_skip=c_skip, c_out=c_out)


def lcm_denoised(sample: jnp.ndarray, eps_pred: jnp.ndarray, grid: LCMGrid,
                 step_idx: int) -> jnp.ndarray:
    """The consistency-model output at one grid step (the LCM 'x0')."""
    ab = jnp.asarray(grid.alpha_bar[step_idx], sample.dtype)
    x0_pred = (sample - jnp.sqrt(1.0 - ab) * eps_pred) / jnp.sqrt(ab)
    return (jnp.asarray(grid.c_out[step_idx], sample.dtype) * x0_pred
            + jnp.asarray(grid.c_skip[step_idx], sample.dtype) * sample)


def lcm_scan(eps_fn, z: jnp.ndarray, grid: LCMGrid, rng_key: jax.Array,
             start_idx: int = 0, end_idx: int | None = None, noise_fn=None):
    """Run LCM steps [start_idx, end_idx); returns (z_next, denoised_last).
    Re-noising uses a fresh key per step; the final grid step returns
    denoised directly (diffusers LCMScheduler.step semantics).

    noise_fn(step_idx, shape, dtype) -> array overrides the inter-step noise
    draw — the whole-pipeline golden injects the SAME noise into this scan
    and the reference engine's scheduler.step so the stochastic consistency
    sampler can be compared pointwise (tests/test_reference_golden_lcm.py)."""
    s = len(grid)
    end = s if end_idx in (None, -1) else end_idx
    z_cur, den = z, z
    for i in range(start_idx, end):  # S <= 8: unrolled python loop jits fine
        eps = eps_fn(z_cur, jnp.asarray(float(grid.t[i])))
        den = lcm_denoised(z_cur, eps, grid, i)
        if i != s - 1:
            if noise_fn is not None:
                noise = jnp.asarray(noise_fn(i, z_cur.shape, z_cur.dtype))
            else:
                noise = jax.random.normal(jax.random.fold_in(rng_key, i),
                                          z_cur.shape, z_cur.dtype)
            abp = jnp.asarray(grid.alpha_bar_prev[i], z_cur.dtype)
            z_cur = jnp.sqrt(abp) * den + jnp.sqrt(1.0 - abp) * noise
        else:
            z_cur = den
    return z_cur, den
