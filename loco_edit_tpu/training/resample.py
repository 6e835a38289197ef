"""Timestep schedule samplers for training.

Functional JAX ports of the reference's sampler capability
(src/models/guided_diffusion/resample.py): `UniformSampler` (:61) and the
importance-sampling `LossSecondMomentResampler` (:124), whose cross-rank
loss gathering (:71-106, torch.distributed all_gather) becomes a `psum`-style
mean inside the sharded train step — under SPMD every host computes the same
history update, so no explicit collective code is needed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UniformSampler:
    num_timesteps: int

    def sample(self, key: jax.Array, batch: int):
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps)
        weights = jnp.ones((batch,), jnp.float32)
        return t, weights

    def init_state(self):
        return ()

    def update(self, state, t, losses):
        return state


@dataclasses.dataclass(frozen=True)
class LossSecondMomentResampler:
    """Importance-sample timesteps proportional to sqrt(E[loss^2]), with a
    uniform floor; weights de-bias the estimate. State is a per-timestep
    loss history ring buffer (reference resample.py:124-154)."""

    num_timesteps: int
    history_per_term: int = 10
    uniform_prob: float = 0.001

    def init_state(self):
        return {
            "history": jnp.zeros((self.num_timesteps, self.history_per_term),
                                 jnp.float32),
            "counts": jnp.zeros((self.num_timesteps,), jnp.int32),
        }

    def _warmed_up(self, state):
        return jnp.all(state["counts"] >= self.history_per_term)

    def _weights(self, state):
        warmed = self._warmed_up(state)
        w = jnp.sqrt(jnp.mean(state["history"] ** 2, axis=-1))
        w = jnp.where(warmed, w, jnp.ones_like(w))
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return w

    def sample(self, key: jax.Array, batch: int, state):
        p = self._weights(state)
        t = jax.random.choice(key, self.num_timesteps, (batch,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update(self, state, t, losses):
        """Insert per-sample losses into the ring buffer at their timesteps.
        (Scatter; under SPMD each replica applies the globally-gathered batch,
        mirroring the reference's all_gather + update_with_all_losses.)"""
        counts = state["counts"]
        history = state["history"]

        def body(carry, inp):
            hist, cnt = carry
            ti, li = inp
            slot = jnp.where(cnt[ti] >= self.history_per_term,
                             self.history_per_term - 1, cnt[ti])
            row = hist[ti]
            # evict oldest when full (shift left), else append
            shifted = jnp.roll(row, -1).at[-1].set(li)
            appended = row.at[slot].set(li)
            new_row = jnp.where(cnt[ti] >= self.history_per_term, shifted, appended)
            hist = hist.at[ti].set(new_row)
            cnt = cnt.at[ti].set(jnp.minimum(cnt[ti] + 1, self.history_per_term))
            return (hist, cnt), None

        (history, counts), _ = jax.lax.scan(
            body, (history, counts), (t, losses.astype(jnp.float32)))
        return {"history": history, "counts": counts}
