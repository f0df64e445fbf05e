"""Seed / PRNG plumbing.

The reference seeds python/numpy/torch RNGs ad hoc in each trainer
(`src/train_multimodal.py:716-721`). Here all device-side randomness flows
from a single `jax.random.key` split per purpose and folded per step, and
host-side randomness (sampling, splits, text augmentation) uses dedicated
`numpy.random.Generator` streams so data order is reproducible and
independent of model randomness.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import numpy as np


def seed_everything(seed: int) -> None:
    """Seed global host RNGs (python hash seed is left alone)."""
    import random

    random.seed(seed)
    np.random.seed(seed)


class RngStreams:
    """Named, independent RNG streams derived from one seed.

    device(name): jax PRNG key for on-device randomness (dropout, augment).
    host(name):   numpy Generator for host-side sampling/splits.
    """

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)
        self._device_cache: Dict[str, jax.Array] = {}
        self._host_cache: Dict[str, np.random.Generator] = {}

    def device(self, name: str) -> jax.Array:
        if name not in self._device_cache:
            self._device_cache[name] = jax.random.fold_in(
                self._root, _stable_hash(name)
            )
        return self._device_cache[name]

    def device_step(self, name: str, step: int) -> jax.Array:
        return jax.random.fold_in(self.device(name), step)

    def host(self, name: str) -> np.random.Generator:
        if name not in self._host_cache:
            self._host_cache[name] = np.random.default_rng(
                np.random.SeedSequence(entropy=self.seed, spawn_key=(_stable_hash(name),))
            )
        return self._host_cache[name]


def _stable_hash(s: str) -> int:
    """Deterministic 31-bit string hash (python's hash() is salted)."""
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) & 0x7FFFFFFF
    return h


def epoch_keys(key: jax.Array, num_steps: int) -> Iterator[jax.Array]:
    for i in range(num_steps):
        yield jax.random.fold_in(key, i)
