"""PRNG handling.

TPU-native replacement for the reference's host-side NumPy MT19937 noise RNG
(reference noise_generation.py:8,18,26,32,37): counter-based `jax.random`
(Threefry) keys, split functionally, usable on device inside jit.
"""

from __future__ import annotations

from typing import Iterator

import jax


def key(seed: int = 0) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split(k: jax.Array, n: int = 2):
    return jax.random.split(k, n)


def key_stream(seed: int) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys for host-side loop use."""
    k = key(seed)
    while True:
        k, sub = jax.random.split(k)
        yield sub
