"""Spatial padding / cropping helpers for NHWC batches.

Implements the serving pad-to-divisor / crop-back contract of the reference
(``transforms.Pad`` at app.py:385,400-405 and the crops at app.py:474-485) as
device ops on NHWC tensors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pad_nhwc(x: jax.Array, padding: Tuple[int, int, int, int], value: float = 0.0) -> jax.Array:
    """padding = (left, top, right, bottom), PIL/torchvision order."""
    left, top, right, bottom = padding
    return jnp.pad(
        x,
        ((0, 0), (top, bottom), (left, right), (0, 0)),
        mode="constant",
        constant_values=value,
    )


def crop_nhwc(x: jax.Array, padding: Tuple[int, int, int, int], out_size: Tuple[int, int]) -> jax.Array:
    """Crop back the region that ``pad_nhwc(padding)`` added.

    out_size = (width, height) of the original image (PIL convention),
    mirroring the `.crop((pad_l, pad_t, pad_l+w, pad_t+h))` calls at
    app.py:475-480.
    """
    left, top, _, _ = padding
    w, h = out_size
    return x[:, top : top + h, left : left + w, :]
