"""The denoiser interface the edit algebra is written against.

Every model family (ADM/P2, SDEdit DDPM, SD 2.1, DeepFloyd-IF, LCM) binds to
this: a pure function eps = f(x, t, cond) plus static metadata. Keeping the
algebra model-agnostic is the structural improvement over the reference, which
duplicates the subspace iteration once per engine
(src/modules/edit.py:283,830,1589,2406).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp

# eps_fn(x, t) -> epsilon; x (B,H,W,C) in the model's native space, t scalar.
EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Denoiser:
    """A bound denoiser: params are closed over, conditioning already applied."""

    eps_fn: EpsFn
    sample_shape: tuple[int, int, int]  # (H, W, C) of the model's state space
    learn_sigma: bool = False
    meta: Any = None
