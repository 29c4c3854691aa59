"""Deterministic RNG threading.

Replaces ``fix_random_seeds`` (``utils/distritributed_model.py:73-79``) with
functional key threading: one root ``jax.random.key`` per run, split per
purpose (init / dropout / data shuffling), with the epoch folded in the same
way the reference's DistributedSampler reseeds per epoch
(``mmaction/datasets/samplers/distributed_sampler.py:28-43``).
"""

from __future__ import annotations

import jax
import numpy as np


class RngStream:
    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)

    def init(self) -> jax.Array:
        return jax.random.fold_in(self._root, 0)

    def dropout(self, step: int) -> jax.Array:
        return jax.random.fold_in(jax.random.fold_in(self._root, 1), step)

    def epoch_permutation(self, epoch: int, n: int) -> np.ndarray:
        """Epoch-seeded deterministic shuffle, identical across hosts
        (the DistributedSampler semantics the reference relies on)."""
        rng = np.random.RandomState(self.seed * 1_000_003 + epoch)
        return rng.permutation(n)
