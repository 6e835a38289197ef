"""The linspace DDIM scheduler.

This is the fidelity-critical component: the reference's custom scheduler
(`YHCustomScheduler`, src/utils/utils.py:305-423; grid construction
src/utils/utils.py:316-329) uses a *continuous* timestep grid
``g_i = linspace(0, 1, n) * t_max`` shared between generation and inversion,
so that invert->generate is an exact round trip of the same ODE discretization.
Model timesteps stay fractional (the sinusoidal embedding accepts floats);
alpha-bar lookups truncate to integer indices (torch.gather on t.long(),
src/utils/utils.py:444-461).

Semantics reproduced exactly:
  - generation over n steps executes n-1 updates: t = g_{n-1}..g_1,
    t_next = g_{n-2}..g_0  (src/utils/utils.py:325-329).
  - inversion over n steps adds +1e-6 to the grid and executes n-2 updates:
    t = g_0..g_{n-3}, t_next = g_1..g_{n-2} — the reference loop breaks one
    entry early (src/modules/edit.py:2146-2148), leaving xT at noise level
    g_{n-2}, after which generation restarts from t = g_{n-1} = t_max.
  - DDIM update in (P_xt, D_xt) form with optional eta-noise
    (src/utils/utils.py:342-383); eta=1 after the "performance boosting"
    timestep reproduces the reference's SDE tail (src/modules/edit.py:2556-2559).
  - learned-sigma DDPM branch (src/utils/utils.py:376-381).

Everything here is pure and shape-static: grids are host-side numpy (they are
trace-time constants), the step functions are jit/scan/jvp-safe jnp code.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.diffusion.schedule import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class TimestepGrid:
    """Per-executed-step timestep/coefficient tables (host-side constants).

    All arrays have shape (S,) where S is the number of executed update steps.
    """

    t: np.ndarray                # model timestep fed to the denoiser (float32)
    t_next: np.ndarray           # target timestep of the update (float32)
    alpha_bar: np.ndarray        # abar[floor(t)]       (float32)
    alpha_bar_next: np.ndarray   # abar[floor(t_next)]  (float32)
    beta: np.ndarray             # beta[floor(t)]       (float32; learned-sigma path)
    is_inversion: bool

    def __len__(self) -> int:
        return int(self.t.shape[0])

    def slice(self, start: int, end: int | None = None) -> "TimestepGrid":
        """Static sub-range of executed steps [start, end)."""
        end = len(self) if end is None else end
        return TimestepGrid(
            t=self.t[start:end],
            t_next=self.t_next[start:end],
            alpha_bar=self.alpha_bar[start:end],
            alpha_bar_next=self.alpha_bar_next[start:end],
            beta=self.beta[start:end],
            is_inversion=self.is_inversion,
        )


class LinspaceDDIM:
    """Continuous-grid DDIM scheduler over a `NoiseSchedule`.

    One scheduler instance drives both generation and inversion; direction is
    purely a property of the grid ordering, exactly as in the reference.
    """

    def __init__(self, schedule: NoiseSchedule | None = None,
                 noise_schedule: str = "linear", t_max: int = 999,
                 learn_sigma: bool = False):
        if schedule is None:
            # reference: the uncond "cosine" table is built with t_max+1
            # entries (src/utils/utils.py:394-397); the linear table and the
            # diffusers checkpoint schedules (scaled_linear for SD/LCM,
            # squaredcos_cap_v2 for IF) all have 1000.
            n = t_max + 1 if noise_schedule == "cosine" else 1000
            schedule = NoiseSchedule.named(noise_schedule, timesteps=n)
        self.schedule = schedule
        self.t_max = t_max
        self.learn_sigma = learn_sigma

    # -- grids ---------------------------------------------------------------

    @staticmethod
    def _linspace_f32(num_steps: int) -> np.ndarray:
        """Bit-exact reproduction of torch.linspace(0, 1, n) on CPU f32
        (the reference grid, src/utils/utils.py:319,326): two-ended
        evaluation with an f32 step, each element one fused multiply-add —
        fwd fma(i, step, 0) below the halfway index, bwd fma(-(n-1-i), step, 1)
        above. Emulated here as exact f64 products with a single rounding.
        A naive f64 linspace differs by 1 ulp on ~18% of entries, and a 1-ulp
        grid difference can flip a floor(t) alpha-bar lookup across an
        integer boundary (pinned by tests/test_scheduler_golden.py)."""
        if num_steps == 1:
            return np.zeros((1,), np.float64)
        i = np.arange(num_steps)
        step = np.float64(np.float32(1.0) / np.float32(num_steps - 1))
        fwd = (i * step).astype(np.float32)
        bwd = (np.float64(1.0) - (num_steps - 1 - i) * step).astype(np.float32)
        return np.where(i < num_steps // 2, fwd, bwd).astype(np.float64)

    def _base_grid(self, num_steps: int) -> np.ndarray:
        # torch multiplies the f32 grid by the int t_max in f32
        g32 = (self._linspace_f32(num_steps).astype(np.float32)
               * np.float32(self.t_max))
        return g32.astype(np.float64)

    def _lookup(self, table: np.ndarray, t: np.ndarray) -> np.ndarray:
        idx = np.clip(t.astype(np.int64), 0, table.shape[0] - 1)
        return table[idx].astype(np.float32)

    def _make(self, t: np.ndarray, t_next: np.ndarray, inversion: bool) -> TimestepGrid:
        ab = self.schedule.alphas_cumprod
        return TimestepGrid(
            t=t.astype(np.float32),
            t_next=t_next.astype(np.float32),
            alpha_bar=self._lookup(ab, t),
            alpha_bar_next=self._lookup(ab, t_next),
            beta=self._lookup(self.schedule.betas, t),
            is_inversion=inversion,
        )

    def generation_grid(self, num_steps: int) -> TimestepGrid:
        """Descending grid; S = num_steps - 1 executed updates."""
        g = self._base_grid(num_steps)
        return self._make(g[1:][::-1], g[:-1][::-1], inversion=False)

    def inversion_grid(self, num_steps: int) -> TimestepGrid:
        """Ascending grid (+1e-6 shift); S = num_steps - 2 executed updates
        (the reference breaks before the final entry, edit.py:2146-2148)."""
        # f32 add, exactly as the reference's f32 tensor + 1e-6 (utils.py:320)
        g = (self._base_grid(num_steps).astype(np.float32)
             + np.float32(1e-6)).astype(np.float64)
        return self._make(g[:-2], g[1:-1], inversion=True)

    # -- derived indices (reference: edit.py:2072-2073) -----------------------

    def nearest_step_index(self, num_steps: int, t_frac: float) -> int:
        """Index into the generation grid closest to t_frac*1000
        (reference computes `argmin |timesteps - edit_t*1000|`)."""
        grid = self.generation_grid(num_steps)
        return int(np.argmin(np.abs(grid.t - t_frac * 1000.0)))

    def boost_eta_flags(self, num_steps: int, boost_t_frac: float) -> np.ndarray:
        """Per-step eta values for the SDE 'performance boosting' tail:
        eta=1 once step index >= boost index, except at the final grid entry
        (src/modules/edit.py:2556-2559)."""
        grid = self.generation_grid(num_steps)
        s = len(grid)
        eta = np.zeros((s,), dtype=np.float32)
        if boost_t_frac > 0:
            b_idx = self.nearest_step_index(num_steps, boost_t_frac)
            if b_idx != s - 1:
                eta[b_idx:] = 1.0
        return eta


# -- pure step math -----------------------------------------------------------

def pmp(xt: jnp.ndarray, et: jnp.ndarray, alpha_bar_t) -> jnp.ndarray:
    """Posterior mean predictor x0_hat(x_t) — the object whose Jacobian is
    low-rank (reference `P_xt`, src/utils/utils.py:362)."""
    ab = jnp.asarray(alpha_bar_t, dtype=xt.dtype)
    return (xt - et * jnp.sqrt(1.0 - ab)) / jnp.sqrt(ab)


def ddim_step(xt: jnp.ndarray, et: jnp.ndarray, alpha_bar_t, alpha_bar_next,
              eta=0.0, noise: jnp.ndarray | None = None):
    """One DDIM update x_t -> x_{t_next} in (P_xt, D_xt) form.

    With eta=0 this is the deterministic ODE step (and is its own inverse
    under grid reversal); with eta>0 the posterior sigma noise is added
    (src/utils/utils.py:342-374). Returns (x_next, x0_hat).
    """
    ab_t = jnp.asarray(alpha_bar_t, dtype=xt.dtype)
    ab_n = jnp.asarray(alpha_bar_next, dtype=xt.dtype)
    eta = jnp.asarray(eta, dtype=xt.dtype)

    x0_hat = (xt - et * jnp.sqrt(1.0 - ab_t)) / jnp.sqrt(ab_t)
    # posterior sigma; clipped at 0 so the (never-taken) eta>0 inversion
    # direction cannot produce NaNs under tracing.
    var = (1.0 - ab_t / ab_n) * (1.0 - ab_n) / (1.0 - ab_t)
    sigma = eta * jnp.sqrt(jnp.maximum(var, 0.0))
    d_xt = jnp.sqrt(jnp.maximum(1.0 - ab_n - sigma**2, 0.0)) * et
    x_next = jnp.sqrt(ab_n) * x0_hat + d_xt
    if noise is not None:
        x_next = x_next + sigma * noise
    return x_next, x0_hat


def ddpm_step_learned_sigma(xt: jnp.ndarray, et: jnp.ndarray, logvar: jnp.ndarray,
                            beta_t, alpha_bar_t, noise: jnp.ndarray):
    """Ancestral DDPM update with model-predicted log-variance
    (src/utils/utils.py:376-381)."""
    b = jnp.asarray(beta_t, dtype=xt.dtype)
    ab = jnp.asarray(alpha_bar_t, dtype=xt.dtype)
    mean = (xt - b / jnp.sqrt(1.0 - ab) * et) / jnp.sqrt(1.0 - b)
    return mean + jnp.exp(0.5 * logvar) * noise
