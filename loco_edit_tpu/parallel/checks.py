"""Cross-host consistency checks.

The reference's closest analogue is the DDP parameter broadcast
(src/models/guided_diffusion/dist_util.py:77-83), which *enforces* sync once;
under SPMD, replicated params stay in sync by construction, but silent
divergence (e.g. host-dependent data ordering feeding a replicated update) is
worth an assertion in long runs. `replicated_params_checksum` computes a
single scalar digest in-graph; comparing it across hosts (it is itself
replicated) or across steps catches drift."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def replicated_params_checksum(params) -> jnp.ndarray:
    """Deterministic scalar digest of a parameter pytree (f32 sum of
    per-leaf weighted sums; cheap, order-stable)."""
    leaves = jax.tree_util.tree_leaves(params)
    total = jnp.zeros((), jnp.float32)
    for i, leaf in enumerate(leaves):
        x = leaf.astype(jnp.float32).ravel()
        w = (jnp.arange(x.shape[0], dtype=jnp.float32) % 97.0) + 1.0
        total = total + jnp.sum(x * w) * ((i % 13) + 1)
    return total
