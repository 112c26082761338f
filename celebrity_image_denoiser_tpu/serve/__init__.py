from celebrity_image_denoiser_tpu.serve.handlers import ServeState, EnhanceError  # noqa: F401
from celebrity_image_denoiser_tpu.serve.app import run_server, make_server  # noqa: F401
