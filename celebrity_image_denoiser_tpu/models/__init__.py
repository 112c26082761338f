from celebrity_image_denoiser_tpu.models.denoise_unet import (  # noqa: F401
    DenoiseGenerator,
    DenoiseDiscriminator,
)
from celebrity_image_denoiser_tpu.models.srgan import (  # noqa: F401
    SRGANGenerator,
    SRGANDiscriminator,
)
from celebrity_image_denoiser_tpu.models.esrgan import (  # noqa: F401
    ESRGANGenerator,
    ESRGANDiscriminator,
)
from celebrity_image_denoiser_tpu.models.cgan import (  # noqa: F401
    CGANKerasGenerator,
    CGANKerasDiscriminator,
)
from celebrity_image_denoiser_tpu.models.cgan_torch import CGANTorchGenerator  # noqa: F401
from celebrity_image_denoiser_tpu.models.dncnn import DnCNN  # noqa: F401
from celebrity_image_denoiser_tpu.models.vgg import VGGFeatures  # noqa: F401
from celebrity_image_denoiser_tpu.models.registry import (  # noqa: F401
    build_generator,
    build_discriminator,
    GENERATORS,
    DISCRIMINATORS,
)
