"""Numerical-precision criteria from BASELINE.md.

The strongest parity evidence is the raw-activation tests in
test_models_parity.py (≤1e-4 vs torch-CPU f32).  This file demonstrates the
BASELINE criterion explicitly: running the TPU-style bf16 serving compute
changes the output by far less than the 0.05 dB PSNR budget relative to the
f32 reference forward.
"""

import numpy as np

import jax
import jax.numpy as jnp

from celebrity_image_denoiser_tpu import metrics, models
from celebrity_image_denoiser_tpu.core import prng


def test_bf16_serving_within_psnr_budget(rng_np):
    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    x01 = rng_np.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    def fwd(x, dtype):
        xin = (jnp.asarray(x).astype(dtype)) * 2.0 - 1.0
        y, _ = model.apply(params, state, xin, train=False)
        y01 = jnp.clip(y.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
        return np.asarray(y01)

    y_f32 = fwd(x01, jnp.float32)
    y_bf16 = fwd(x01, jnp.bfloat16)

    # PSNR of bf16 output against the f32 reference output: must be far
    # above the level where a 0.05 dB quality delta could appear.
    fidelity = np.asarray(metrics.psnr(jnp.asarray(y_bf16), jnp.asarray(y_f32),
                                       data_range=1.0))
    assert fidelity.min() > 40.0, fidelity  # bf16 ≈ identical output

    # and the downstream quality metric moves by < 0.05 dB
    clean = x01  # arbitrary target for the delta check
    p32 = np.asarray(metrics.psnr(jnp.asarray(y_f32), jnp.asarray(clean), data_range=1.0))
    p16 = np.asarray(metrics.psnr(jnp.asarray(y_bf16), jnp.asarray(clean), data_range=1.0))
    assert np.abs(p32 - p16).max() < 0.05, (p32, p16)


def test_remat_step_matches_plain(rng_np):
    """jax.checkpoint in the train step must not change the math."""
    from celebrity_image_denoiser_tpu.train.gan_trainer import make_train_step

    g, d = models.DenoiseGenerator(), models.DenoiseDiscriminator()
    init_fn, step_plain = make_train_step(g, d, family="denoise", donate=False)
    _, step_remat = make_train_step(g, d, family="denoise", donate=False,
                                    remat=True)
    carry = init_fn(prng.key(0))
    noisy = jnp.asarray(rng_np.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    clean = jnp.asarray(rng_np.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32))
    lr = jnp.asarray(1e-4, jnp.float32)
    c1, m1 = step_plain(carry, noisy, clean, prng.key(1), lr, lr)
    c2, m2 = step_remat(carry, noisy, clean, prng.key(1), lr, lr)
    np.testing.assert_allclose(float(m1["g_loss"]), float(m2["g_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c1[0]["down1"]["0"]["kernel"]),
        np.asarray(c2[0]["down1"]["0"]["kernel"]), rtol=1e-5, atol=1e-7)


def test_serving_tiled_routing_matches_direct(rng_np):
    """ServeState routes tall images through exact single-device tiling —
    the result must equal the direct forward."""
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir="/nonexistent", tile_threshold_rows=64)
    model = st.models["denoise"]
    params, state = st.params["denoise"]
    x = jnp.asarray(rng_np.uniform(-1, 1, (1, 192, 32, 3)).astype(np.float32))
    y_tiled = st._forward("denoise", model, params, state, x)
    y_direct, _ = model.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(y_tiled), np.asarray(y_direct),
                               rtol=1e-5, atol=1e-5)
