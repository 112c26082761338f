"""Pallas kernel tests.

Run in interpret mode on the CPU backend (conftest forces cpu): validates
kernel *logic*; the compiled Mosaic path is exercised by benchmarks/ and the
TPU drive in the verify skill.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from celebrity_image_denoiser_tpu import ops


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_conv3x3_bias_relu_matches_xla(rng_np, interpret_pallas):
    from celebrity_image_denoiser_tpu.ops.pallas import conv_fused

    x = jnp.asarray(rng_np.standard_normal((2, 32, 16, 64)).astype(np.float32))
    w = jnp.asarray(rng_np.standard_normal((3, 3, 64, 128)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng_np.standard_normal((128,)).astype(np.float32))
    ref = jnp.maximum(ops.conv2d(x, w, b, stride=1, padding=1), 0)
    got = conv_fused.conv3x3_bias_relu(x, w, b, relu=True, tile_h=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_v2_matches_xla(rng_np, interpret_pallas):
    """The crash-safe shifted-inputs formulation (no manual DMA)."""
    from celebrity_image_denoiser_tpu.ops.pallas import conv_fused

    x = jnp.asarray(rng_np.standard_normal((2, 32, 16, 64)).astype(np.float32))
    w = jnp.asarray(rng_np.standard_normal((3, 3, 64, 128)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng_np.standard_normal((128,)).astype(np.float32))
    ref = jnp.maximum(ops.conv2d(x, w, b, stride=1, padding=1), 0)
    got = conv_fused.conv3x3_bias_relu_v2(x, w, b, relu=True, tile_h=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_no_relu_and_channel_padding(rng_np, interpret_pallas):
    from celebrity_image_denoiser_tpu.ops.pallas import conv_fused

    # cin=3 exercises the 3→128 channel-padding path
    x = jnp.asarray(rng_np.standard_normal((1, 16, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng_np.standard_normal((3, 3, 3, 64)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng_np.standard_normal((64,)).astype(np.float32))
    ref = ops.conv2d(x, w, b, stride=1, padding=1)
    got = conv_fused.conv3x3_bias_relu(x, w, b, relu=False, tile_h=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_noise_kernel_statistics(interpret_pallas):
    # pltpu.prng_seed has no CPU interpreter lowering in this jax version;
    # the compiled kernel is exercised on the real chip (verify skill drive:
    # mean≈0, std≈σ, deterministic per seed — observed on TPU v5e).
    if jax.default_backend() != "tpu":
        pytest.skip("TPU PRNG primitives lack a CPU interpret path")
    from celebrity_image_denoiser_tpu.ops.pallas import noise_kernel

    xu = jnp.full((2, 64, 64, 3), 128, jnp.uint8)
    out = noise_kernel.fused_normalize_gaussian_noise(
        jnp.int32(42), xu, sigma=25.0, out_dtype=jnp.float32)
    o = np.asarray(out)
    base = 128 / 255 * 2 - 1
    d = (o - base) * 255 / 2
    assert abs(d.mean()) < 1.0
    assert abs(d.std() - 25.0) < 2.0
    assert o.min() >= -1.0 and o.max() <= 1.0
    # deterministic for fixed seed; different across seeds
    o2 = np.asarray(noise_kernel.fused_normalize_gaussian_noise(
        jnp.int32(42), xu, sigma=25.0, out_dtype=jnp.float32))
    np.testing.assert_array_equal(o, o2)
    o3 = np.asarray(noise_kernel.fused_normalize_gaussian_noise(
        jnp.int32(43), xu, sigma=25.0, out_dtype=jnp.float32))
    assert (o3 != o).any()


def test_xla_fallback_same_semantics():
    from celebrity_image_denoiser_tpu.ops.pallas import noise_kernel

    xu = jnp.full((2, 32, 32, 3), 100, jnp.uint8)
    out = noise_kernel.xla_normalize_gaussian_noise(
        jax.random.PRNGKey(0), xu, sigma=25.0, out_dtype=jnp.float32)
    o = np.asarray(out)
    base = 100 / 255 * 2 - 1
    d = (o - base) * 255 / 2
    assert abs(d.std() - 25.0) < 2.5
    assert o.min() >= -1.0 and o.max() <= 1.0


@pytest.mark.parametrize("kpack", [False, True])
def test_double_conv_matches_xla(rng_np, interpret_pallas, kpack):
    """Fused conv→ReLU→conv→ReLU block (ops/pallas/double_conv.py) vs the
    sequential XLA pair, including the image-border semantics (conv2's zero
    padding must see 0, not conv1-past-the-edge)."""
    from celebrity_image_denoiser_tpu.ops.pallas import double_conv

    x = jnp.asarray(rng_np.standard_normal((2, 32, 16, 24)).astype(np.float32))
    w1 = jnp.asarray(rng_np.standard_normal((3, 3, 24, 32)).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng_np.standard_normal((32,)).astype(np.float32))
    w2 = jnp.asarray(rng_np.standard_normal((3, 3, 32, 40)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng_np.standard_normal((40,)).astype(np.float32))
    h = jnp.maximum(ops.conv2d(x, w1, b1, stride=1, padding=1), 0)
    ref = jnp.maximum(ops.conv2d(h, w2, b2, stride=1, padding=1), 0)
    got = double_conv.double_conv3x3_relu(x, w1, b1, w2, b2, tile_h=8,
                                          kpack=kpack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kpack", [False, True])
def test_double_conv_first_layer_c3(rng_np, interpret_pallas, kpack):
    """The FIRST-layer pair 3→64→64 (VERDICT r3 next #4): the bandwidth-
    bound case where fusing pays — conv1's 64-wide intermediate stays in
    VMEM instead of round-tripping HBM.  C0=3 exercises the sub-lane input
    channel count the generic kernel must still handle exactly, including
    image borders."""
    from celebrity_image_denoiser_tpu.ops.pallas import double_conv

    x = jnp.asarray(rng_np.standard_normal((2, 32, 16, 3)).astype(np.float32))
    w1 = jnp.asarray(
        rng_np.standard_normal((3, 3, 3, 64)).astype(np.float32)) * 0.2
    b1 = jnp.asarray(rng_np.standard_normal((64,)).astype(np.float32))
    w2 = jnp.asarray(
        rng_np.standard_normal((3, 3, 64, 64)).astype(np.float32)) * 0.1
    b2 = jnp.asarray(rng_np.standard_normal((64,)).astype(np.float32))
    h = jnp.maximum(ops.conv2d(x, w1, b1, stride=1, padding=1), 0)
    ref = jnp.maximum(ops.conv2d(h, w2, b2, stride=1, padding=1), 0)
    got = double_conv.double_conv3x3_relu(x, w1, b1, w2, b2, tile_h=8,
                                          kpack=kpack)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
