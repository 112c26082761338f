from celebrity_image_denoiser_tpu.train.optim import (  # noqa: F401
    adam,
    sgd,
    step_lr,
)
from celebrity_image_denoiser_tpu.train import losses  # noqa: F401
from celebrity_image_denoiser_tpu.train.gan_trainer import GANTrainer  # noqa: F401
