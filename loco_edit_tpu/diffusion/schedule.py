"""Noise (beta / alpha-bar) schedules.

Behavioral parity targets (values, not code) in the reference:
  - linear schedule: beta linspace(1e-4, 0.02, 1000) in float64
    (src/utils/utils.py:385-406).
  - cosine schedule: improved-DDPM cosine with s=0.008, clipped to 0.999
    (src/utils/utils.py:413-423).
All accumulation is done on host in float64 (matching the reference's
torch.float64 betas) and the resulting alpha-bar table is kept in float64;
consumers cast at the point of use.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def linear_betas(beta_start: float = 1e-4, beta_end: float = 0.02,
                 timesteps: int = 1000) -> np.ndarray:
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)


def scaled_linear_betas(beta_start: float = 0.00085, beta_end: float = 0.012,
                        timesteps: int = 1000) -> np.ndarray:
    """The Stable-Diffusion-family beta schedule (diffusers "scaled_linear"):
    linspace in sqrt-beta space, then squared. SD 2.1/1.5 and the LCM
    Dreamshaper checkpoints are trained on this table; the reference keeps
    each checkpoint's own alphas_cumprod when it monkey-patches the scheduler
    (src/utils/utils.py:147-170), so the T2I engines must too."""
    return np.linspace(np.sqrt(beta_start), np.sqrt(beta_end), timesteps,
                       dtype=np.float64) ** 2


def cosine_betas(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Improved-DDPM cosine schedule (arXiv 2102.09672)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    ab = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ab = ab / ab[0]
    betas = 1 - (ab[1:] / ab[:-1])
    return np.clip(betas, 0.0, 0.999)


def alphas_cumprod_from_betas(betas: np.ndarray) -> np.ndarray:
    return np.cumprod(1.0 - betas, axis=0)


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Immutable alpha-bar table for a diffusion process."""

    betas: np.ndarray           # (T,), float64
    alphas_cumprod: np.ndarray  # (T,), float64

    @classmethod
    def linear(cls, beta_start: float = 1e-4, beta_end: float = 0.02,
               timesteps: int = 1000) -> "NoiseSchedule":
        b = linear_betas(beta_start, beta_end, timesteps)
        return cls(betas=b, alphas_cumprod=alphas_cumprod_from_betas(b))

    @classmethod
    def cosine(cls, timesteps: int = 1000, s: float = 0.008) -> "NoiseSchedule":
        b = cosine_betas(timesteps, s)
        return cls(betas=b, alphas_cumprod=alphas_cumprod_from_betas(b))

    @classmethod
    def scaled_linear(cls, beta_start: float = 0.00085, beta_end: float = 0.012,
                      timesteps: int = 1000) -> "NoiseSchedule":
        b = scaled_linear_betas(beta_start, beta_end, timesteps)
        return cls(betas=b, alphas_cumprod=alphas_cumprod_from_betas(b))

    @classmethod
    def named(cls, name: str, timesteps: int = 1000) -> "NoiseSchedule":
        if name == "linear":
            return cls.linear(timesteps=timesteps)
        if name == "scaled_linear":
            return cls.scaled_linear(timesteps=timesteps)
        if name in ("cosine", "squaredcos_cap_v2"):
            # reference builds the uncond cosine table with t_max+1 steps
            # (src/utils/utils.py:394-397); diffusers squaredcos_cap_v2 (the
            # IF checkpoints) uses 1000 — same formula, caller picks timesteps
            return cls.cosine(timesteps=timesteps)
        raise ValueError(f"unknown noise schedule {name!r}")

    @classmethod
    def from_alphas_cumprod(cls, ab: np.ndarray) -> "NoiseSchedule":
        ab = np.asarray(ab, dtype=np.float64)
        alphas = ab / np.concatenate([[1.0], ab[:-1]])
        return cls(betas=1.0 - alphas, alphas_cumprod=ab)

    @property
    def num_train_timesteps(self) -> int:
        return self.alphas_cumprod.shape[0]
