"""Null-space projection of edit directions.

vT <- vT_modify - V_null V_null^T vT_modify, rows renormalized: removes from
the edit basis any component visible to the Jacobian restricted to the mask
complement, so the walk cannot leak outside the edit region
(reference src/modules/edit.py:2316-2323; same math at :427-433, :1001-1008,
:1826-1833, :1940-1952).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_rows(vT: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-normalize; eps guards the degenerate case where projection (or a
    loaded zero direction) annihilates a row — without it the NaN would
    silently propagate into saved direction files and edited strips."""
    n = jnp.linalg.norm(vT, axis=1, keepdims=True)
    return vT / jnp.maximum(n, eps)


def null_space_project(vT_modify: jnp.ndarray, vT_null: jnp.ndarray,
                       rank_null: int | None = None) -> jnp.ndarray:
    """Project the rows of vT_modify onto the orthocomplement of the top
    `rank_null` rows of vT_null; rows renormalized."""
    vn = vT_null if rank_null is None else vT_null[:rank_null, :]
    proj = (vn.T @ (vn @ vT_modify.T)).T
    return normalize_rows(vT_modify - proj)
