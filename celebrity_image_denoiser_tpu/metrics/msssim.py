"""Multi-scale SSIM (pytorch_msssim convention).

The reference uses ``pytorch_msssim.MS_SSIM(data_range=1.0)`` on denormed
[0,1] tensors (training.py:283,390).  Same algorithm here: 5 scales with the
Wang et al. weights, 11×11 Gaussian σ=1.5, biased covariance, 2×2 average-
pool downsampling, relu on cs terms as pytorch_msssim does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from celebrity_image_denoiser_tpu.metrics.psnr_ssim import _gaussian_filter, _ssim_maps

_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(x):
    return lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1), padding="VALID",
    ) / 4.0


@partial(jax.jit, static_argnames=("data_range", "win", "sigma"))
def ms_ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0,
            win: int = 11, sigma: float = 1.5) -> jax.Array:
    """Per-image MS-SSIM for NHWC (returns (N,)), scalar for HWC.
    Smallest scale must keep H, W ≥ win after 4 halvings (≥ 176 px input
    for the default window, matching pytorch_msssim's constraint)."""
    squeeze = a.ndim == 3
    if squeeze:
        a, b = a[None], b[None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    filt = lambda x: _gaussian_filter(x, win, sigma)  # noqa: E731
    mcs = []
    for i in range(len(_WEIGHTS)):
        s, cs = _ssim_maps(a, b, data_range, filt, None)
        if i < len(_WEIGHTS) - 1:
            mcs.append(jnp.maximum(jnp.mean(cs, axis=(1, 2, 3)), 0.0))
            a, b = _avg_pool2(a), _avg_pool2(b)
        else:
            ssim_last = jnp.maximum(jnp.mean(s, axis=(1, 2, 3)), 0.0)
    out = ssim_last ** _WEIGHTS[-1]
    for w, cs in zip(_WEIGHTS[:-1], mcs):
        out = out * (cs ** w)
    return out[0] if squeeze else out
