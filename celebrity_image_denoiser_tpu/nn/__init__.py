from celebrity_image_denoiser_tpu.nn.module import (  # noqa: F401
    Module,
    Sequential,
    Lambda,
)
from celebrity_image_denoiser_tpu.nn.layers import (  # noqa: F401
    Conv2d,
    ConvTranspose2d,
    Linear,
    BatchNorm2d,
    PReLU,
    ReLU,
    LeakyReLU,
    Tanh,
    Sigmoid,
    MaxPool2d,
    PixelShuffle,
    GlobalAvgPool,
    Flatten,
    Embedding,
)
