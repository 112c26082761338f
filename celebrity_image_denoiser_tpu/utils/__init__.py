from celebrity_image_denoiser_tpu.utils import tree  # noqa: F401
from celebrity_image_denoiser_tpu.utils.logging import get_logger  # noqa: F401
