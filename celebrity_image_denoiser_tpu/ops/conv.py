"""Convolution primitives (NHWC / HWIO), XLA path.

These are the TPU-native replacements for the reference's cuDNN-backed
``nn.Conv2d`` / ``nn.ConvTranspose2d`` calls (e.g. reference backend/app.py:
43-77).  Semantics match PyTorch exactly (symmetric integer padding,
cross-correlation, ConvTranspose output size (in-1)*s - 2p + k), verified by
golden tests against torch-CPU in tests/test_ops_parity.py.

XLA lowers ``lax.conv_general_dilated`` onto the MXU as an implicit GEMM and
fuses the surrounding elementwise work; a hand-written Pallas fused conv lives
in ops/pallas/ for the cases where profiling shows it beats XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from celebrity_image_denoiser_tpu.ops import quant

IntOr2 = Union[int, Tuple[int, int], Sequence[int]]

# Trace-time flag: inside a differentiated training step, a low-precision
# conv must not request a higher preferred_element_type — the f32 cotangent
# at the primitive output mismatches the bf16 operands and lax.conv's
# transpose rule rejects it.  Serving/inference keeps preferred=f32 (measured
# ~6% faster on the 128² U-Net step than bf16-out convs).  The GAN trainer
# sets this around its model applies (train/gan_trainer._wrap).
import contextlib as _contextlib
import contextvars as _contextvars

_AD_SAFE = _contextvars.ContextVar("cid_conv_ad_safe", default=False)


@_contextlib.contextmanager
def ad_safe_low_precision():
    tok = _AD_SAFE.set(True)
    try:
        yield
    finally:
        _AD_SAFE.reset(tok)

# NHWC activations, HWIO kernels, NHWC outputs — the TPU-native layout.
DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def _pair(v: IntOr2) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias=None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
    groups: int = 1,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """2-D convolution, PyTorch ``nn.Conv2d`` semantics on NHWC/HWIO.

    x: (N, H, W, C_in); kernel: (kH, kW, C_in // groups, C_out).
    ``padding`` is symmetric integer padding like torch (not SAME/VALID).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    # under AD (training), low-precision inputs keep their own output dtype
    # (see ad_safe_low_precision above); the MXU accumulates bf16 convs in
    # f32 at the hardware level either way.
    pet = preferred_dtype
    if _AD_SAFE.get() and jnp.dtype(x.dtype) != jnp.dtype(preferred_dtype):
        pet = None

    def _run(xx, kk, pet_):
        return lax.conv_general_dilated(
            xx,
            kk,
            window_strides=(sh, sw),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=(dh, dw),
            dimension_numbers=DIMENSION_NUMBERS,
            feature_group_count=groups,
            preferred_element_type=pet_,
        )

    # int8 serving path / calibration tap (ops/quant.py); None = float path
    y = quant.conv_hook(x, kernel, -1, _run)
    if y is None:
        y = _run(x, kernel.astype(x.dtype), pet).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d_transpose(
    x: jax.Array,
    kernel: jax.Array,
    bias=None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """2-D transposed convolution, PyTorch ``nn.ConvTranspose2d`` semantics.

    x: (N, H, W, C_in); kernel: (kH, kW, C_out, C_in) — note the transposed
    channel order (matches torch's (C_in, C_out, kH, kW) after HWOI layout).
    Output spatial size: (in - 1) * stride - 2 * padding + kernel.

    Implemented the XLA-native way as a fractionally-strided convolution:
    dilate the input by ``stride`` (lhs_dilation), pad by (k - 1 - p), and
    convolve with the spatially-flipped kernel.  This is a single
    ``conv_general_dilated`` the TPU backend maps straight onto the MXU —
    no scatter, no host logic.
    """
    kh, kw = int(kernel.shape[0]), int(kernel.shape[1])
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    pet = preferred_dtype
    if _AD_SAFE.get() and jnp.dtype(x.dtype) != jnp.dtype(preferred_dtype):
        pet = None  # see conv2d: AD-transposability with low-precision inputs

    def _run(xx, kk, pet_):
        # Flip spatially, swap channel axes to HWIO with I=C_in, O=C_out —
        # inside the closure so the int8 path's quantized kernel gets the
        # identical treatment.
        k2 = jnp.swapaxes(jnp.flip(kk, axis=(0, 1)), 2, 3)
        return lax.conv_general_dilated(
            xx,
            k2,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=pet_,
        )

    # int8 serving path / calibration tap (ops/quant.py); raw-kernel
    # out-channel axis is 2 for the (kH, kW, C_out, C_in) transpose layout
    y = quant.conv_hook(x, kernel, 2, _run)
    if y is None:
        y = _run(x, kernel.astype(x.dtype), pet).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
