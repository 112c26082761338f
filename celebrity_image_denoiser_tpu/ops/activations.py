"""Elementwise activations (VPU work; XLA fuses these into adjacent convs)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """LeakyReLU; the reference uses slope 0.2 throughout
    (training.py:82-91, training5Pbar.py:20-32)."""
    return jnp.where(x >= 0, x, x * negative_slope)


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """PReLU with learnable slope (torch default: one shared scalar inited to
    0.25), as used by SRGAN/ESRGAN (app.py:154,175; models.py:12,24)."""
    return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(x)


def tanh(x: jax.Array) -> jax.Array:
    return jnp.tanh(x)
