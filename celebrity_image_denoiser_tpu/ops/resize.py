"""Image resize on device.

TPU-native replacement for the reference's host-side resizes:
PIL bicubic (noise_generation.py:61, app.py:315-316), tf.image lanczos3
(sr_ganpreprocess.py:26-27), cv2 (DataP2.py:19-20).  ``jax.image.resize``
compiles to gather/matmul sequences XLA fuses; keeps the whole preprocessing
pipeline on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize(x: jax.Array, size: Tuple[int, int], method: str = "bicubic") -> jax.Array:
    """Resize NHWC (or HWC) images to (height, width) = size."""
    if x.ndim == 3:
        out_shape = (size[0], size[1], x.shape[-1])
    elif x.ndim == 4:
        out_shape = (x.shape[0], size[0], size[1], x.shape[-1])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = jax.image.resize(xf, out_shape, method=method)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        y = jnp.clip(jnp.round(y), info.min, info.max)
    return y.astype(orig_dtype)


def resize_bicubic(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bicubic resize to (height, width); the reference's default
    interpolation for dataset prep (PIL BICUBIC)."""
    return resize(x, size, method="bicubic")


def resize_lanczos3(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Lanczos-3 resize to (height, width) — the reference's TF cleanup
    path resizes with ``tf.image.resize(..., method='lanczos3')``
    (sr_ganpreprocess.py:26-27); ``jax.image.resize`` implements the same
    a=3 Lanczos kernel."""
    return resize(x, size, method="lanczos3")
