from celebrity_image_denoiser_tpu.ops.conv import (  # noqa: F401
    conv2d,
    conv2d_transpose,
)
from celebrity_image_denoiser_tpu.ops.pool import (  # noqa: F401
    max_pool2d,
    global_avg_pool,
)
from celebrity_image_denoiser_tpu.ops.activations import (  # noqa: F401
    relu,
    leaky_relu,
    prelu,
    sigmoid,
    tanh,
)
from celebrity_image_denoiser_tpu.ops.norm import batch_norm  # noqa: F401
from celebrity_image_denoiser_tpu.ops.pixelshuffle import pixel_shuffle  # noqa: F401
from celebrity_image_denoiser_tpu.ops.resize import resize_bicubic, resize_lanczos3, resize  # noqa: F401
from celebrity_image_denoiser_tpu.ops.padding import pad_nhwc, crop_nhwc  # noqa: F401
