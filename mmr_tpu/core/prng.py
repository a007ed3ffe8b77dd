"""Keyed-PRNG discipline.

The reference mixes `random` / `np.random` / torch seeding (seed 6210 at
``ModelTraining.py:150-156``, split seed 12345 at ``Pre_Process.py:95,143``).
Its exact streams cannot be reproduced; per SURVEY.md §7.3(6) we define our own
splittable-key discipline: one root key, named fold-ins per subsystem, per-step
fold-ins by (epoch, step) so any step's randomness is reconstructible.
"""

from __future__ import annotations

import random

import jax
import numpy as np

# Seeds of record in the reference, kept as defaults for familiarity:
DEFAULT_SEED = 6210      # ModelTraining.py:150
DEFAULT_SPLIT_SEED = 12345  # Pre_Process.py:95,143,1123


def seed_everything(seed: int = DEFAULT_SEED) -> jax.Array:
    """Seed host-side RNGs (numpy/random, used by host samplers) and return a
    root JAX key for device-side randomness."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)


class RngStream:
    """Deterministic named/indexed key derivation from a root key.

    >>> rng = RngStream(seed_everything(0))
    >>> k = rng.step("augment", epoch=3, step=17)
    """

    def __init__(self, root: jax.Array):
        self.root = root

    def named(self, name: str) -> jax.Array:
        return jax.random.fold_in(self.root, _stable_hash(name))

    def step(self, name: str, epoch: int, step: int) -> jax.Array:
        k = self.named(name)
        k = jax.random.fold_in(k, epoch)
        return jax.random.fold_in(k, step)


def _stable_hash(name: str) -> int:
    h = 2166136261
    for b in name.encode():
        h = ((h ^ b) * 16777619) & 0x7FFFFFFF
    return h
