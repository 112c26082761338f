"""PSNR / SSIM on device, matching the reference's two conventions.

The reference computes metrics two ways and the framework reproduces both:

* skimage convention (denoise/SRGAN/ESRGAN trainers, training.py:382-383):
  ``ssim`` here = skimage ``structural_similarity`` defaults — 7×7 uniform
  window, unbiased covariance, channel-wise mean — including the quirk of
  calling it with data_range=2.0 on [-1,1] tensors (and ESRGAN's
  data_range=1.0 on clamped [0,1], esrgan_train.py:125-132).
* TF convention (cGAN trainer, training5Pbar.py:108-109): ``ssim_tf`` =
  ``tf.image.ssim`` — 11×11 Gaussian σ=1.5, biased covariance, max_val=2.0.

All functions take NHWC (or HWC) float arrays and are jittable; per-image
values are returned so callers can reproduce the reference's per-image-then-
mean reduction (training.py:382).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def psnr(a: jax.Array, b: jax.Array, data_range: float = 2.0) -> jax.Array:
    """Per-image PSNR over NHWC (returns (N,)) or scalar for HWC."""
    batched = a.ndim == 4
    axes = tuple(range(1, a.ndim)) if batched else None
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=axes)
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jax.Array, win: int) -> jax.Array:
    """Mean filter via separable reduce_window, VALID — x: (N,H,W,C)."""
    ones = jnp.ones((), x.dtype)
    s = lax.reduce_window(
        x, 0.0 * ones, lax.add,
        window_dimensions=(1, win, 1, 1), window_strides=(1, 1, 1, 1), padding="VALID",
    )
    s = lax.reduce_window(
        s, 0.0 * ones, lax.add,
        window_dimensions=(1, 1, win, 1), window_strides=(1, 1, 1, 1), padding="VALID",
    )
    return s / (win * win)


def _gaussian_kernel(win: int, sigma: float) -> jax.Array:
    half = (win - 1) / 2.0
    coords = jnp.arange(win, dtype=jnp.float32) - half
    g = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _gaussian_filter(x: jax.Array, win: int, sigma: float) -> jax.Array:
    """Separable Gaussian, VALID, depthwise over channels — x: (N,H,W,C)."""
    g = _gaussian_kernel(win, sigma).astype(x.dtype)
    c = x.shape[-1]
    kh = jnp.tile(g.reshape(win, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, win, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    return x


def _ssim_maps(a, b, data_range, filt, unbiased_norm):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ua, ub = filt(a), filt(b)
    uaa, ubb, uab = filt(a * a), filt(b * b), filt(a * b)
    va = uaa - ua * ua
    vb = ubb - ub * ub
    vab = uab - ua * ub
    if unbiased_norm is not None:
        va, vb, vab = va * unbiased_norm, vb * unbiased_norm, vab * unbiased_norm
    lum = (2 * ua * ub + c1) / (ua * ua + ub * ub + c1)
    cs = (2 * vab + c2) / (va + vb + c2)
    return lum * cs, cs


@partial(jax.jit, static_argnames=("data_range", "win"))
def ssim(a: jax.Array, b: jax.Array, data_range: float = 2.0, win: int = 7) -> jax.Array:
    """skimage-convention SSIM (uniform window, unbiased covariance).
    Per-image values for NHWC, scalar for HWC."""
    squeeze = a.ndim == 3
    if squeeze:
        a, b = a[None], b[None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    np_win = win * win
    norm = np_win / (np_win - 1.0)  # skimage uses the unbiased estimator
    s, _ = _ssim_maps(a, b, data_range, lambda x: _uniform_filter(x, win), norm)
    out = jnp.mean(s, axis=(1, 2, 3))
    return out[0] if squeeze else out


@partial(jax.jit, static_argnames=("max_val", "win", "sigma"))
def ssim_tf(a: jax.Array, b: jax.Array, max_val: float = 2.0,
            win: int = 11, sigma: float = 1.5) -> jax.Array:
    """tf.image.ssim convention (Gaussian window, biased covariance)."""
    squeeze = a.ndim == 3
    if squeeze:
        a, b = a[None], b[None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    s, _ = _ssim_maps(a, b, max_val, lambda x: _gaussian_filter(x, win, sigma), None)
    out = jnp.mean(s, axis=(1, 2, 3))
    return out[0] if squeeze else out
