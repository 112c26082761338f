"""Pallas TPU kernels for the framework's hot ops.

Each kernel has an XLA fallback behind the same API; ``autotune.pick``
measures both on the live chip and selects the faster (never trust a
hand kernel without receipts).  Kernels:

* fused_noise — single-pass uint8→[-1,1] normalize + Gaussian noise
  injection using the TPU's native PRNG (pltpu.prng_random_bits), replacing
  a multi-op jax.random sequence in the training input path.
* conv3x3_bias_act — implicit-GEMM 3×3 same-conv with fused bias + ReLU
  (shifted-matmul formulation driving the MXU).
* double_conv3x3_relu — the U-Net's conv→ReLU→conv→ReLU block fused in one
  kernel (intermediate stays in VMEM; optional K=9·C MXU packing).  On-chip
  receipt says XLA's pair is faster (benchmarks/kernel_notes.md) — kept as
  a verified experiment, not the dispatch.
"""

from celebrity_image_denoiser_tpu.ops.pallas.noise_kernel import (  # noqa: F401
    fused_normalize_gaussian_noise,
)
from celebrity_image_denoiser_tpu.ops.pallas.conv_fused import (  # noqa: F401
    conv3x3_bias_relu,
)
from celebrity_image_denoiser_tpu.ops.pallas.double_conv import (  # noqa: F401
    double_conv3x3_relu,
)
