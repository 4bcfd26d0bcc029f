"""Explicit seed policy.

The reference has no active seeding (commented helper, ref: train.py:63-74);
since JAX randomness is key-threaded this module just centralizes the split
discipline: one root key per run, derived keys per subsystem.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@dataclasses.dataclass
class Seeds:
    root: int = 0

    def key(self, name: str) -> jax.Array:
        h = abs(hash((self.root, name))) % (2**31)
        return jax.random.key(h)

    def numpy(self, name: str) -> np.random.Generator:
        h = abs(hash((self.root, name))) % (2**31)
        return np.random.default_rng(h)
