"""Mixed-precision policy: bf16 compute / fp32 params and reductions.

The reference trains fp32 throughout (its fp16 paths are dead —
``主要框架.py:260-263``, ``mmaction/apis/train.py:87-99``).  On TPU, bf16
activations feed the MXU at full rate while fp32 parameters and fp32 softmax /
norm / loss reductions preserve the AUROC-critical numerics (cluster argmin
labels are sensitive to catastrophic cancellation — SURVEY §7.3.2).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_reduce(self, x):
        return jnp.asarray(x, self.reduce_dtype)


FP32 = DTypePolicy(compute_dtype=jnp.float32)
BF16 = DTypePolicy()


def policy(bf16: bool) -> DTypePolicy:
    return BF16 if bf16 else FP32
