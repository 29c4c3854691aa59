"""Memory module wrapper (MNAD-style) over the fused ops.

Parity with ``model/Memory.py:62-262``.  The memory bank is *state*, not a
trained parameter (the reference passes ``m_items`` in and detaches updates),
so it lives in a ``memory`` variable collection: functional apply returns the
updated bank, matching JAX's explicit-state model.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vadcl_tpu.ops.memory import (
    MemoryLosses,
    _l2_normalize,
    memory_losses,
    memory_read,
    memory_update,
)


class MemoryOut(NamedTuple):
    updated_query: jax.Array  # (B, H, W, 2d)
    keys: jax.Array  # (M, d) possibly-updated bank
    score_query: jax.Array
    score_memory: jax.Array
    separateness: jax.Array
    compactness: jax.Array


class MemoryModule(nn.Module):
    memory_size: int = 10
    key_dim: int = 512
    # temp_update / temp_gather exist in the reference signature but are never
    # used by its compute path (model/Memory.py:63-70); kept for API parity.
    temp_update: float = 0.1
    temp_gather: float = 0.1

    @nn.compact
    def __call__(self, query: jax.Array, train: bool = True) -> MemoryOut:
        """query: (B, H, W, d) raw features (normalized internally, as
        ``model/Memory.py:148``)."""
        keys_var = self.variable(
            "memory",
            "keys",
            lambda: _l2_normalize(
                jax.random.uniform(
                    jax.random.key(2023), (self.memory_size, self.key_dim)
                ),
                axis=1,
            ),
        )
        keys = keys_var.value
        q = _l2_normalize(query, axis=-1)
        losses: MemoryLosses = memory_losses(q, keys)
        read = memory_read(q, keys)
        if train:
            new_keys = memory_update(q, keys)
            if not self.is_initializing():
                # only written on the training path (train step applies with
                # mutable=['memory']); eval/viz use plain apply with train=False
                keys_var.value = new_keys
        else:
            new_keys = keys
        return MemoryOut(
            updated_query=read.updated_query,
            keys=new_keys,
            score_query=read.score_query,
            score_memory=read.score_memory,
            separateness=losses.separateness,
            compactness=losses.compactness,
        )
