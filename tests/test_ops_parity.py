"""Golden tests: ops vs torch-CPU reference semantics.

torch is a *test-only* dependency here — it provides the ground truth for the
PyTorch layer semantics the reference models rely on (conv padding,
ConvTranspose output arithmetic, BN running stats, PixelShuffle channel
ordering).  The framework itself never imports torch on the compute path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from celebrity_image_denoiser_tpu import ops  # noqa: E402


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,hw",
    [
        (3, 64, 3, 1, 1, (16, 16)),
        (64, 64, 3, 2, 1, (16, 16)),
        (3, 8, 9, 1, 4, (20, 20)),
        (8, 4, 1, 1, 0, (8, 8)),
        (5, 7, 3, 2, 1, (15, 13)),  # odd sizes
    ],
)
def test_conv2d_matches_torch(rng_np, cin, cout, k, stride, padding, hw):
    x = rng_np.standard_normal((2, *hw, cin), dtype=np.float32)
    w_oihw = rng_np.standard_normal((cout, cin, k, k), dtype=np.float32)
    b = rng_np.standard_normal((cout,), dtype=np.float32)

    ref = F.conv2d(_nchw(x), torch.from_numpy(w_oihw), torch.from_numpy(b),
                   stride=stride, padding=padding)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = ops.conv2d(jnp.asarray(x), jnp.asarray(w_hwio), jnp.asarray(b),
                     stride=stride, padding=padding)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,hw",
    [
        (256, 128, 2, 2, 0, (8, 8)),   # denoise U-Net up2 (app.py:65)
        (128, 64, 2, 2, 0, (16, 16)),  # denoise U-Net up1 (app.py:73)
        (128, 128, 4, 2, 1, (8, 8)),   # torch-arch cGAN (app.py:116)
        (6, 5, 3, 1, 1, (7, 9)),
    ],
)
def test_conv_transpose2d_matches_torch(rng_np, cin, cout, k, stride, padding, hw):
    x = rng_np.standard_normal((2, *hw, cin), dtype=np.float32)
    w_iohw = rng_np.standard_normal((cin, cout, k, k), dtype=np.float32)
    b = rng_np.standard_normal((cout,), dtype=np.float32)

    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w_iohw),
                             torch.from_numpy(b), stride=stride, padding=padding)
    # our layout: (kH, kW, C_out, C_in)
    w = np.transpose(w_iohw, (2, 3, 1, 0))
    got = ops.conv2d_transpose(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               stride=stride, padding=padding)
    assert got.shape == _to_nhwc(ref).shape
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_max_pool2d_matches_torch(rng_np):
    x = rng_np.standard_normal((2, 17, 15, 6), dtype=np.float32)
    ref = F.max_pool2d(_nchw(x), kernel_size=2, stride=2)
    got = ops.max_pool2d(jnp.asarray(x), 2, 2)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_pixel_shuffle_matches_torch(rng_np):
    x = rng_np.standard_normal((2, 5, 7, 36), dtype=np.float32)
    ref = F.pixel_shuffle(_nchw(x), 3)
    got = ops.pixel_shuffle(jnp.asarray(x), 3)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_global_avg_pool_matches_torch(rng_np):
    x = rng_np.standard_normal((2, 9, 11, 4), dtype=np.float32)
    ref = F.adaptive_avg_pool2d(_nchw(x), 1)
    got = ops.global_avg_pool(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("train", [True, False])
def test_batch_norm_matches_torch(rng_np, train):
    c = 8
    x = rng_np.standard_normal((4, 6, 6, c), dtype=np.float32)
    scale = rng_np.standard_normal((c,), dtype=np.float32)
    bias = rng_np.standard_normal((c,), dtype=np.float32)
    run_mean = rng_np.standard_normal((c,), dtype=np.float32)
    run_var = np.abs(rng_np.standard_normal((c,), dtype=np.float32)) + 0.5

    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(run_mean))
        bn.running_var.copy_(torch.from_numpy(run_var))
    bn.train(train)
    ref = bn(_nchw(x))

    got, new_state = ops.batch_norm(
        jnp.asarray(x),
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        {"mean": jnp.asarray(run_mean), "var": jnp.asarray(run_var)},
        train=train,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-4, atol=1e-4)
    if train:
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), bn.running_mean.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), bn.running_var.numpy(), rtol=1e-4, atol=1e-5
        )


def test_batch_norm_keras_convention(rng_np):
    """Keras BN: eps 1e-3, momentum 0.99 with running = m*run + (1-m)*batch
    (flipped vs torch), and the running-var update uses the BIASED batch
    variance (unlike torch) — checked against a manual numpy computation
    here and against real Keras 3 in tests/test_tf_golden.py."""
    from celebrity_image_denoiser_tpu import ops

    c = 4
    x = rng_np.standard_normal((3, 5, 5, c)).astype(np.float32)
    scale = np.ones(c, np.float32)
    bias = np.zeros(c, np.float32)
    run_mean = np.full(c, 0.3, np.float32)
    run_var = np.full(c, 2.0, np.float32)
    got, new_state = ops.batch_norm(
        jnp.asarray(x),
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        {"mean": jnp.asarray(run_mean), "var": jnp.asarray(run_var)},
        train=True, eps=1e-3, momentum=0.99, keras_momentum=True,
    )
    bm = x.mean(axis=(0, 1, 2))
    bv = x.var(axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(got), (x - bm) / np.sqrt(bv + 1e-3), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               0.99 * run_mean + 0.01 * bm, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               0.99 * run_var + 0.01 * bv, rtol=1e-5)


def test_leaky_relu_and_prelu(rng_np):
    x = rng_np.standard_normal((2, 4, 4, 3), dtype=np.float32)
    ref = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    got = ops.leaky_relu(jnp.asarray(x), 0.2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)

    alpha = np.asarray([0.25], dtype=np.float32)
    ref = F.prelu(torch.from_numpy(x), torch.from_numpy(alpha)).numpy()
    got = ops.prelu(jnp.asarray(x), jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_pad_crop_roundtrip(rng_np):
    from celebrity_image_denoiser_tpu.core.config import get_padding

    x = rng_np.standard_normal((1, 30, 50, 3), dtype=np.float32)
    padding = get_padding((50, 30), divisor=4, scale=1)  # (w, h) PIL order
    padded = ops.pad_nhwc(jnp.asarray(x), padding)
    assert padded.shape[1] % 4 == 0 and padded.shape[2] % 4 == 0
    back = ops.crop_nhwc(padded, padding, (50, 30))
    np.testing.assert_array_equal(np.asarray(back), x)


def test_get_padding_matches_reference_semantics():
    from celebrity_image_denoiser_tpu.core.config import get_padding

    # Reference formula at app.py:276-281
    for (w, h), divisor, scale in [((50, 30), 4, 1), ((64, 64), 4, 4), ((7, 9), 4, 1)]:
        eff = divisor * scale
        pad_w = (eff - w % eff) % eff
        pad_h = (eff - h % eff) % eff
        expected = (pad_w // 2, pad_h // 2, pad_w - pad_w // 2, pad_h - pad_h // 2)
        assert get_padding((w, h), divisor, scale) == expected


def test_lanczos3_resize_matches_pil_and_differs_from_bicubic(rng_np):
    """The reference's TF cleanup path resizes lanczos3
    (sr_ganpreprocess.py:26-27); ops.resize_lanczos3 must implement the same
    a=3 kernel — PIL LANCZOS is the independent reference (≤1 u8 count on
    downsample) — and actually differ from bicubic."""
    from PIL import Image

    from celebrity_image_denoiser_tpu.ops.resize import (
        resize_bicubic,
        resize_lanczos3,
    )

    base = rng_np.random((8, 8, 3))
    img_u8 = (np.kron(base, np.ones((8, 8, 1)))[:64, :64] * 255).astype(np.uint8)

    pil = np.asarray(Image.fromarray(img_u8).resize(
        (16, 16), Image.Resampling.LANCZOS), np.float32)
    got = np.asarray(resize_lanczos3(jnp.asarray(img_u8), (16, 16)), np.float32)
    assert np.abs(pil - got).max() <= 1.0  # rounding of identical filters

    bic = np.asarray(resize_bicubic(jnp.asarray(img_u8), (16, 16)), np.float32)
    assert np.abs(bic - got).mean() > 0.5  # a genuinely different kernel

    const = np.full((32, 32, 3), 77, np.uint8)
    out = np.asarray(resize_lanczos3(jnp.asarray(const), (16, 16)))
    assert (out == 77).all()

    # the host decode path exposes the same option (imread_rgb method=)
    import io as _io

    from celebrity_image_denoiser_tpu.data import imageio as iio

    buf = _io.BytesIO()
    Image.fromarray(img_u8).save(buf, "PNG")
    host = iio.imread_rgb(buf.getvalue(), (16, 16), method="lanczos")
    assert np.abs(host.astype(np.float32) - pil).max() == 0.0


def test_linear_resize_matches_cv2(rng_np, tmp_path):
    """The cGAN cache stage resizes with cv2's default INTER_LINEAR
    (DataP2.py:19-20).  Both the device op (ops.resize linear,
    antialias=False) and the host reader (imread_rgb method='cv2-linear')
    must match real cv2 (same filter; ≤3e-5 float accumulation-order
    noise on [0,255] data)."""
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from celebrity_image_denoiser_tpu import ops
    from celebrity_image_denoiser_tpu.data import imageio

    img = rng_np.uniform(0, 255, (96, 80, 3)).astype(np.float32)
    for hw in [(256, 256), (48, 40)]:
        ref = cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(ops.resize(jnp.asarray(img), hw, method="linear",
                                    antialias=False))
        np.testing.assert_allclose(got, ref, atol=1e-3)

    # host path through a real encoded file (w, h) PIL-order size: must be
    # BIT-EXACT to the reference's computation — cv2's fixed-point uint8
    # kernel on the uint8 array (DataP2 resizes the uint8 image directly;
    # a float32 resize+round differs on ~12% of pixels by ±1 LSB)
    img_u8 = img.astype(np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(img_u8).save(p)
    got = imageio.imread_rgb(p, (40, 48), method="cv2-linear")
    ref = cv2.resize(img_u8, (40, 48), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(got, ref)

    # the no-cv2 fallback (ops.resize float path) stays within ±1 u8 count
    # of the fixed-point result
    fb = np.asarray(ops.resize(img_u8, (48, 40), method="linear",
                               antialias=False))
    assert np.abs(fb.astype(np.int32) - ref.astype(np.int32)).max() <= 1
