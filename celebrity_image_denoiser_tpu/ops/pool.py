"""Pooling primitives (NHWC).

Replaces the reference's ``nn.MaxPool2d(2, 2)`` (app.py:48,56) and
``nn.AdaptiveAvgPool2d(1)`` (training.py:92, sr_ganTrainGNew.py:72) with XLA
``reduce_window`` / mean reductions that fuse cleanly on TPU.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def max_pool2d(x: jax.Array, window: IntOr2 = 2, stride: IntOr2 = None) -> jax.Array:
    """Max pooling with VALID padding (floor division of spatial dims),
    matching ``nn.MaxPool2d(window, stride)`` defaults."""
    wh, ww = _pair(window)
    sh, sw = _pair(stride if stride is not None else window)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """``nn.AdaptiveAvgPool2d(1)`` equivalent: mean over H, W."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
