"""Native (C++) preprocessing stage tests: build, correctness vs numpy/PIL."""

import numpy as np
import pytest

from celebrity_image_denoiser_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native stage not built (no g++?)"
)


def test_assemble_batch_normalize_only(rng_np):
    imgs = [rng_np.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(4)]
    out = native.assemble_batch(imgs, (32, 32), mean=0.5, std=0.5)
    ref = np.stack([(i.astype(np.float32) / 255 - 0.5) / 0.5 for i in imgs])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_assemble_batch_resizes(rng_np):
    imgs = [rng_np.integers(0, 256, (64, 48, 3), dtype=np.uint8) for _ in range(3)]
    out = native.assemble_batch(imgs, (32, 32), mean=0.0, std=1.0)
    assert out.shape == (3, 32, 32, 3)
    assert out.min() >= -0.01 and out.max() <= 1.01
    # downscale of random noise should preserve the mean closely
    for i, img in enumerate(imgs):
        assert abs(out[i].mean() - img.mean() / 255.0) < 0.02


def test_resize_matches_pil_closely(rng_np):
    from PIL import Image

    img = rng_np.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    got = native.resize_u8(img, (20, 20)).astype(np.int16)
    ref = np.asarray(
        Image.fromarray(img).resize((20, 20), Image.Resampling.BICUBIC)
    ).astype(np.int16)
    # same Catmull-Rom kernel; small differences from PIL's fixed-point path
    assert np.mean(np.abs(got - ref)) < 2.0
    assert np.max(np.abs(got - ref)) <= 30


def test_identity_resize_roundtrip(rng_np):
    img = rng_np.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = native.resize_u8(img, (16, 16))
    np.testing.assert_array_equal(out, img)
