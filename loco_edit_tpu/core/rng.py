"""RNG discipline.

The reference seeds every framework RNG once per run
(`seed_everything`, reference src/utils/define_argparser.py:251-258) and then
relies on global stateful generators. JAX is functional: we hold a single root
key per run and derive named, independent streams with `jax.random.fold_in`,
so every consumer (init noise, eta-noise per sampling step, probe init) is
reproducible and order-independent.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import random

import jax
import numpy as np


def _stable_hash(name: str) -> int:
    """Deterministic 32-bit hash of a stream name (python's hash() is salted;
    jax.random.fold_in takes uint32 data)."""
    return int.from_bytes(hashlib.blake2b(name.encode(), digest_size=4).digest(), "big")


@dataclasses.dataclass(frozen=True)
class RngStream:
    """A named, forkable source of JAX PRNG keys rooted at a single seed."""

    key: jax.Array

    @classmethod
    def from_seed(cls, seed: int) -> "RngStream":
        return cls(key=jax.random.key(seed))

    def fork(self, name: str) -> "RngStream":
        """Derive an independent child stream identified by `name`."""
        return RngStream(key=jax.random.fold_in(self.key, _stable_hash(name)))

    def at_step(self, step) -> jax.Array:
        """Key for a given (traced or static) integer step, e.g. inside lax.scan."""
        return jax.random.fold_in(self.key, step)


def seed_everything(seed: int) -> RngStream:
    """Seed host-side RNGs (numpy / python / PYTHONHASHSEED) and return the root
    JAX stream. Mirrors the reference's `seed_everything`
    (src/utils/define_argparser.py:251-258) minus torch/cudnn knobs, which have
    no TPU counterpart: XLA is deterministic given fixed keys.
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed % (2**32))
    random.seed(seed)
    return RngStream.from_seed(seed)
