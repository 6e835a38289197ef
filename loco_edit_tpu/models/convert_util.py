"""Shared checkpoint-conversion utilities."""

from __future__ import annotations

from typing import Mapping

import numpy as np


class KeyTracker:
    """Wraps a state_dict and records every key read, so converters can
    enforce full coverage — a silent partial load (geometry mismatch, renamed
    keys) becomes a hard error instead of random-looking outputs."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = sd
        self.used: set[str] = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self.sd[k]

    def __contains__(self, k):
        return k in self.sd

    def unused(self) -> list[str]:
        return sorted(set(self.sd.keys()) - self.used)

    def check(self, what: str) -> None:
        leftovers = self.unused()
        if leftovers:
            raise ValueError(
                f"{what} conversion left {len(leftovers)} checkpoint keys "
                f"unconsumed (geometry mismatch?): {leftovers[:8]}...")
