"""Parameter initializers matching the reference frameworks' defaults.

torch layers use kaiming_uniform(a=sqrt(5)) for weights — which reduces to
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for biases; Keras
layers use glorot_uniform weights and zero biases.  Matching these keeps
random-init behavior (and the serving fallback "random init" path,
reference app.py:333-336) statistically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_uniform(rng: jax.Array, shape, fan_in: int, dtype=jnp.float32) -> jax.Array:
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def glorot_uniform(
    rng: jax.Array, shape, fan_in: int, fan_out: int, dtype=jnp.float32
) -> jax.Array:
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def zeros(shape, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype)
