"""Statistical checks for the on-device noise ops (all 3 reference variants).

Exact RNG streams differ from NumPy's MT19937 by design (counter-based
Threefry on device); distributional parameters must match the reference
functions cited in data/noise.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from celebrity_image_denoiser_tpu.data import noise


KEY = jax.random.PRNGKey(0)
IMG = jnp.full((64, 64, 3), 0.5, jnp.float32)


def test_gaussian_v1_sigma25():
    out = noise.add_noise(KEY, IMG, "gaussian", variant=1)
    delta = np.asarray(out - IMG)
    assert abs(delta.std() * 255 - 25.0) < 1.5
    assert abs(delta.mean()) < 0.01
    assert out.min() >= 0 and out.max() <= 1


def test_salt_pepper_v1_fractions():
    # the reference draws p*H*W*C coords over the H*W pixel grid → effective
    # per-pixel rate 1 - e^(-p*C) ≈ 5.82% per polarity (noise.py docstring);
    # pepper overwrites salt on overlap
    out = np.asarray(noise.add_noise(KEY, IMG, "salt_pepper", variant=1))
    p_eff = 1 - np.exp(-0.02 * 3)
    salt = (out == 1.0).all(axis=-1).mean()
    pepper = (out == 0.0).all(axis=-1).mean()
    assert abs(pepper - p_eff) < 0.012
    assert abs(salt - p_eff * (1 - p_eff)) < 0.012


def test_salt_pepper_v2_amount():
    out = np.asarray(noise.add_noise(KEY, IMG, "salt_pepper", variant=2))
    flipped = ((out == 1.0) | (out == 0.0)).mean()
    assert abs(flipped - 0.05) < 0.01


def test_speckle_multiplicative():
    img = jnp.full((64, 64, 3), 0.8, jnp.float32)
    out = noise.add_noise(KEY, img, "speckle", variant=1)
    delta = np.asarray(out - img)
    # std ≈ img * sigma = 0.8 * 0.1 (clip shaves a bit)
    assert abs(delta.std() - 0.08) < 0.01


def test_poisson_v1_mean_preserving():
    out = noise.add_noise(KEY, IMG, "poisson", variant=1)
    assert abs(float(out.mean()) - 0.5) < 0.01
    # poisson at λ=127.5: std ≈ sqrt(127.5)/255 ≈ 0.0443
    assert abs(float(jnp.std(out)) - np.sqrt(127.5) / 255) < 0.01


def test_uniform_variants():
    o1 = np.asarray(noise.add_noise(KEY, IMG, "uniform", variant=1)) - 0.5
    assert o1.min() >= 0 and o1.max() <= 25 / 255 + 1e-6  # [0, 25)
    o2 = np.asarray(noise.add_noise(KEY, IMG, "uniform", variant=2)) - 0.5
    assert abs(o2.mean()) < 0.01  # symmetric [-50, 50)
    o3 = np.asarray(noise.add_noise(KEY, IMG, "uniform", variant=3)) - 0.5
    assert np.abs(o3).max() <= 0.05 + 1e-6


def test_gaussian_v3_var():
    out = noise.add_noise(KEY, IMG, "gaussian", variant=3)
    assert abs(float(jnp.std(out - IMG)) - 0.1) < 0.01


def test_poisson_v3_exact_unique_scaling():
    """Offline-path poisson must use the reference's exact per-image scale
    vals = 2^ceil(log2(#unique)) (esrgan_addNoise.py:32-34), not the jitted
    path's vals=256 approximation."""
    # image quantized to 5 distinct levels → vals = 2^ceil(log2(5)) = 8
    rng = np.random.default_rng(0)
    img = rng.integers(0, 5, (32, 32, 3)).astype(np.float32) / 8.0
    assert len(np.unique(img)) == 5
    # parity with the reference formula, computed independently
    ref_vals = 2.0 ** np.ceil(np.log2(len(np.unique(img))))
    assert noise.v3_poisson_vals(img) == ref_vals == 8.0
    out = np.asarray(noise.poisson_v3_exact(KEY, img))
    # Pois(img*8)/8 lands on multiples of 1/8 (clip keeps that lattice) —
    # the vals=256 approximation would produce a 1/256 lattice instead
    assert np.allclose(out * 8.0, np.round(out * 8.0), atol=1e-6)
    approx = np.asarray(noise.poisson_v3(KEY, jnp.asarray(img)))
    assert not np.allclose(approx * 8.0, np.round(approx * 8.0), atol=1e-6)
    # mean-preserving like any poisson scaling
    assert abs(float(out.mean()) - float(img.mean())) < 0.02
    # degenerate images: constant → vals=1, empty-safe
    assert noise.v3_poisson_vals(np.zeros((4, 4))) == 1.0


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown noise"):
        noise.add_noise(KEY, IMG, "perlin", variant=1)


def test_random_noise_batch_jits_and_varies():
    batch = jnp.tile(IMG[None], (8, 1, 1, 1))
    out = noise.random_noise_batch(KEY, batch, variant=1)
    assert out.shape == batch.shape
    # different samples got different noise
    deltas = np.asarray(out - batch).reshape(8, -1)
    stds = deltas.std(axis=1)
    assert len(np.unique(np.round(stds, 4))) > 1


def test_blind_gaussian_sigma_range():
    batch = jnp.full((16, 32, 32, 3), 0.5, jnp.float32)
    out = noise.blind_gaussian_batch(KEY, batch, 5.0, 50.0)
    stds = np.asarray(out - batch).reshape(16, -1).std(axis=1) * 255
    assert stds.min() > 2.0 and stds.max() < 60.0
    assert stds.max() - stds.min() > 10.0  # actually blind, not fixed
