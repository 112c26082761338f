from celebrity_image_denoiser_tpu.metrics.psnr_ssim import (  # noqa: F401
    psnr,
    ssim,
    ssim_tf,
)
from celebrity_image_denoiser_tpu.metrics.msssim import ms_ssim  # noqa: F401
from celebrity_image_denoiser_tpu.metrics.perceptual import PerceptualDistance  # noqa: F401
