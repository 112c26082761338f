"""PixelShuffle (depth-to-space), NHWC, matching torch ``nn.PixelShuffle``.

Used by the SRGAN upscale path (reference app.py:173-175).  torch's NCHW
PixelShuffle maps channel c = c_out * r^2 + dy * r + dx; in NHWC this is a
reshape/transpose chain that XLA compiles to a pure layout change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, upscale_factor: int) -> jax.Array:
    """x: (N, H, W, C * r^2) -> (N, H*r, W*r, C), torch channel ordering."""
    r = upscale_factor
    n, h, w, c = x.shape
    assert c % (r * r) == 0, f"channels {c} not divisible by r^2={r * r}"
    c_out = c // (r * r)
    # torch layout: channel index = c_out_idx * r*r + dy * r + dx
    x = jnp.reshape(x, (n, h, w, c_out, r, r))
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # (n, h, dy, w, dx, c_out)
    return jnp.reshape(x, (n, h * r, w * r, c_out))
