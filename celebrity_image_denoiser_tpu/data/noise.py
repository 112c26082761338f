"""Noise synthesis — on-device, counter-based, jit-compatible.

The reference renders noisy datasets offline to disk with host NumPy RNG in
three inconsistent numeric conventions (SURVEY.md §2):

* **variant 1** (uint8 [0,255] domain; denoise_gan_code/noise_generation.py:
  6-39): gaussian σ=25, salt&pepper p=0.02/0.02, speckle σ=0.1,
  poisson(λ=pixel), uniform [0,25).
* **variant 2** (PIL+skimage; srgan_code/sr_ganNoise.py:7-43, identical in
  cgan_code/noisemaker_compClass.py:8-44): gaussian σ=25, s&p amount=0.05
  (half salt, half pepper), skimage-style poisson, speckle σ=0.1,
  uniform [-50,50).
* **variant 3** (float [0,1] domain; esrgan_code/esrgan_addNoise.py:7-41):
  gaussian var=0.01, s&p amount=0.004, speckle ~N(0,1), poisson with
  2^ceil(log2(#unique)) scaling, uniform [-0.05,0.05).

Here all three run on device with `jax.random` (Threefry) so noise injection
happens on-the-fly inside the jitted train step — no noisy dataset on disk,
no host RNG in the loop.  All functions take and return **float images scaled
to [0,1]** (NHWC or HWC) and are vmappable/jittable.

jit-ability note: variant 3's poisson scaling uses the data-dependent count
of unique values in the image; under jit this is approximated by the uint8
bit depth (vals=256), which is exact for any full-range 8-bit source image.
The offline renderer (cli.noise_gen) runs on the host where the exact
semantics ARE computable, so it uses ``poisson_v3_exact`` (per-image
``2^ceil(log2(#unique))``, esrgan_addNoise.py:32-34).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

NOISE_TYPES = ("gaussian", "salt_pepper", "speckle", "poisson", "uniform")


def _clip01(x):
    return jnp.clip(x, 0.0, 1.0)


# ---- variant 1: uint8-domain parameters, expressed on [0,1] ---------------

def gaussian_v1(key, img, mean=0.0, sigma=25.0):
    noise = mean / 255.0 + (sigma / 255.0) * jax.random.normal(key, img.shape, img.dtype)
    return _clip01(img + noise)


def salt_pepper_v1(key, img, salt_prob=0.02, pepper_prob=0.02):
    """Per-pixel (all channels) salt/pepper matching noise_generation.py:
    12-22's *effective* density: the reference draws num = p·H·W·C pixel
    coordinates with replacement over the H·W grid (the channel coordinate is
    discarded), so a pixel flips with probability 1 − e^(−p·C) ≈ 5.8% per
    polarity at p=0.02, C=3 — not p itself.  Pepper overwrites salt on
    overlap, as in the reference (pepper applied second)."""
    k1, k2 = jax.random.split(key)
    c = img.shape[-1]
    p_salt = 1.0 - jnp.exp(-salt_prob * c)
    p_pepper = 1.0 - jnp.exp(-pepper_prob * c)
    pix_shape = img.shape[:-1] + (1,)
    salt = jax.random.uniform(k1, pix_shape) < p_salt
    pepper = jax.random.uniform(k2, pix_shape) < p_pepper
    out = jnp.where(salt, 1.0, img)
    return jnp.where(pepper, 0.0, out)


def speckle_v1(key, img, sigma=0.1):
    noise = img * (sigma * jax.random.normal(key, img.shape, img.dtype))
    return _clip01(img + noise)


def poisson_v1(key, img):
    """np.random.poisson(uint8_pixel), i.e. λ = pixel value in [0,255]."""
    lam = img * 255.0
    noisy = jax.random.poisson(key, lam, img.shape).astype(img.dtype) / 255.0
    return _clip01(noisy)


def uniform_v1(key, img, low=0.0, high=25.0):
    noise = jax.random.uniform(
        key, img.shape, img.dtype, minval=low / 255.0, maxval=high / 255.0
    )
    return _clip01(img + noise)


# ---- variant 2: skimage-style --------------------------------------------

def gaussian_v2(key, img):
    return gaussian_v1(key, img, 0.0, 25.0)


def salt_pepper_v2(key, img, amount=0.05):
    """skimage random_noise(mode='s&p', amount): amount of *all* pixels
    flipped, half to salt half to pepper, per-element (not per-pixel)."""
    k1, k2 = jax.random.split(key)
    flip = jax.random.uniform(k1, img.shape) < amount
    salted = jax.random.uniform(k2, img.shape) < 0.5
    out = jnp.where(flip & salted, 1.0, img)
    return jnp.where(flip & ~salted, 0.0, out)


def speckle_v2(key, img, sigma=0.1):
    return speckle_v1(key, img, sigma)


def poisson_v2(key, img, vals=256.0):
    """skimage poisson: out = Pois(img * vals) / vals, vals = 2^bitdepth."""
    noisy = jax.random.poisson(key, img * vals, img.shape).astype(img.dtype) / vals
    return _clip01(noisy)


def uniform_v2(key, img, low=-50.0, high=50.0):
    noise = jax.random.uniform(
        key, img.shape, img.dtype, minval=low / 255.0, maxval=high / 255.0
    )
    return _clip01(img + noise)


# ---- variant 3: float [0,1] domain ----------------------------------------

def gaussian_v3(key, img, var=0.01):
    return _clip01(img + (var ** 0.5) * jax.random.normal(key, img.shape, img.dtype))


def salt_pepper_v3(key, img, amount=0.004):
    k1, k2 = jax.random.split(key)
    half = amount * 0.5
    salt = jax.random.uniform(k1, img.shape) < half
    pepper = jax.random.uniform(k2, img.shape) < half
    out = jnp.where(salt, 1.0, img)
    return jnp.where(pepper, 0.0, out)


def speckle_v3(key, img):
    return _clip01(img + img * jax.random.normal(key, img.shape, img.dtype))


def poisson_v3(key, img, vals=256.0):
    return poisson_v2(key, img, vals)


def v3_poisson_vals(img) -> float:
    """Exact variant-3 poisson scaling base: ``2^ceil(log2(#unique))``
    (esrgan_addNoise.py:32-34).  Host-side only — the unique count is
    data-dependent and can't trace under jit (the jitted path fixes
    vals=256, exact for any full-range 8-bit source image)."""
    import numpy as np

    arr = np.asarray(img)
    n = len(np.unique(arr)) if arr.size else 1
    return float(2.0 ** np.ceil(np.log2(max(n, 1))))


def poisson_v3_exact(key, img):
    """Variant-3 poisson with the reference's exact per-image scaling
    (esrgan_addNoise.py:32-36): vals from the image's unique-value count,
    then Pois(img·vals)/vals.  Host path (offline rendering, cli.noise_gen);
    the on-device jitted path keeps the vals=256 approximation."""
    return poisson_v2(key, jnp.asarray(img), v3_poisson_vals(img))


def uniform_v3(key, img, low=-0.05, high=0.05):
    return _clip01(img + jax.random.uniform(key, img.shape, img.dtype,
                                            minval=low, maxval=high))


_VARIANTS = {
    1: {
        "gaussian": gaussian_v1,
        "salt_pepper": salt_pepper_v1,
        "speckle": speckle_v1,
        "poisson": poisson_v1,
        "uniform": uniform_v1,
    },
    2: {
        "gaussian": gaussian_v2,
        "salt_pepper": salt_pepper_v2,
        "speckle": speckle_v2,
        "poisson": poisson_v2,
        "uniform": uniform_v2,
    },
    3: {
        "gaussian": gaussian_v3,
        "salt_pepper": salt_pepper_v3,
        "speckle": speckle_v3,
        "poisson": poisson_v3,
        "uniform": uniform_v3,
    },
}


def add_noise(key: jax.Array, img: jax.Array, kind: str, variant: int = 1) -> jax.Array:
    """Apply one named noise type; img float in [0,1], any leading dims."""
    try:
        fn = _VARIANTS[variant][kind]
    except KeyError:
        raise ValueError(
            f"unknown noise kind/variant: {kind!r}/{variant} "
            f"(kinds: {NOISE_TYPES}, variants: 1|2|3)"
        ) from None
    return fn(key, img)


@partial(jax.jit, static_argnames=("types", "variant"))
def random_noise_batch(
    key: jax.Array,
    batch: jax.Array,
    types: Sequence[str] = NOISE_TYPES,
    variant: int = 1,
) -> jax.Array:
    """Per-sample random noise type over an NHWC batch — the on-device
    replacement for the reference's pre-rendered 5-way noisy dataset.

    Uses ``lax.switch`` over the type index so the whole augmentation stays
    inside one compiled program (no data-dependent Python control flow).
    """
    n = batch.shape[0]
    k_sel, k_noise = jax.random.split(key)
    type_idx = jax.random.randint(k_sel, (n,), 0, len(types))
    sample_keys = jax.random.split(k_noise, n)
    fns = [_VARIANTS[variant][t] for t in types]

    def one(idx, k, img):
        return jax.lax.switch(idx, fns, k, img)

    return jax.vmap(one)(type_idx, sample_keys, batch)


def blind_gaussian_batch(
    key: jax.Array, batch: jax.Array, sigma_min: float = 5.0, sigma_max: float = 50.0
) -> jax.Array:
    """Blind-σ Gaussian noise for DnCNN training (BASELINE config 3):
    per-sample σ ~ U[sigma_min, sigma_max] on the 0-255 scale."""
    k1, k2 = jax.random.split(key)
    n = batch.shape[0]
    sigma = jax.random.uniform(k1, (n,), minval=sigma_min, maxval=sigma_max) / 255.0
    noise = jax.random.normal(k2, batch.shape, batch.dtype)
    sigma = sigma.reshape((n,) + (1,) * (batch.ndim - 1))
    return _clip01(batch + sigma * noise)
