"""Dtype conventions for TPU execution.

Params are kept in float32; activations/matmuls may run in bfloat16 (the MXU's
native high-throughput dtype).  All ops accept a ``compute_dtype`` and cast at
entry so XLA sees a single consistent dtype per fusion cluster.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def canonical(dtype) -> jnp.dtype:
    if isinstance(dtype, str):
        return _DTYPES[dtype]
    return dtype


def cast_to(x, dtype):
    dtype = canonical(dtype)
    if x.dtype == dtype:
        return x
    return x.astype(dtype)
