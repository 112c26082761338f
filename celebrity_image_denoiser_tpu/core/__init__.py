from celebrity_image_denoiser_tpu.core import config, dtypes, prng  # noqa: F401
