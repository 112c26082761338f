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


def resize(x: jax.Array, size: Tuple[int, int], method: str = "bicubic",
           antialias: bool = True) -> jax.Array:
    """Resize NHWC (or HWC) images to (height, width) = size.

    ``antialias`` only affects downscales (widens the filter support to the
    source pitch).  True matches PIL; False matches ``tf.image.resize``'s
    default (verified ≤2e-4 on [0,255] vs TF for lanczos3 both ways)."""
    if x.ndim == 3:
        out_shape = (size[0], size[1], x.shape[-1])
    elif x.ndim == 4:
        out_shape = (x.shape[0], size[0], size[1], x.shape[-1])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = jax.image.resize(xf, out_shape, method=method, antialias=antialias)
    if jnp.issubdtype(orig_dtype, jnp.integer):
        info = jnp.iinfo(orig_dtype)
        y = jnp.clip(jnp.round(y), info.min, info.max)
    return y.astype(orig_dtype)


def resize_bicubic(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bicubic resize to (height, width); the reference's default
    interpolation for dataset prep (PIL BICUBIC)."""
    return resize(x, size, method="bicubic")


def resize_lanczos3(x: jax.Array, size: Tuple[int, int],
                    antialias: bool = True) -> jax.Array:
    """Lanczos-3 resize to (height, width) — the reference's TF cleanup
    path resizes with ``tf.image.resize(..., method='lanczos3')``
    (sr_ganpreprocess.py:26-27); ``jax.image.resize`` implements the same
    a=3 Lanczos kernel.

    The reference's TF call leaves ``antialias`` at TF's default (False);
    pass ``antialias=False`` for exact parity with that pipeline on
    downscales (golden-tested against real TF in tests/test_tf_golden.py).
    The default True is the PIL-LANCZOS-equivalent, higher-quality choice."""
    return resize(x, size, method="lanczos3", antialias=antialias)
