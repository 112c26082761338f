"""Model registry — build generators/discriminators by the serving names
used in MODEL_CFG (reference app.py:228-233,319-324)."""

from __future__ import annotations

from typing import Callable, Dict

from celebrity_image_denoiser_tpu.models.cgan import (
    CGANKerasDiscriminator,
    CGANKerasGenerator,
)
from celebrity_image_denoiser_tpu.models.cgan_torch import CGANTorchGenerator
from celebrity_image_denoiser_tpu.models.denoise_unet import (
    DenoiseDiscriminator,
    DenoiseGenerator,
)
from celebrity_image_denoiser_tpu.models.dncnn import DnCNN
from celebrity_image_denoiser_tpu.models.esrgan import (
    ESRGANDiscriminator,
    ESRGANGenerator,
)
from celebrity_image_denoiser_tpu.models.srgan import (
    SRGANDiscriminator,
    SRGANGenerator,
)

GENERATORS: Dict[str, Callable] = {
    "denoise": DenoiseGenerator,
    "srgan": SRGANGenerator,
    "esrgan": ESRGANGenerator,
    "cgan": CGANKerasGenerator,        # serving default backend (app.py:469)
    "cgan_torch": CGANTorchGenerator,  # torch fallback backend
    "dncnn": DnCNN,
}

DISCRIMINATORS: Dict[str, Callable] = {
    "denoise": DenoiseDiscriminator,
    "srgan": SRGANDiscriminator,
    "esrgan": ESRGANDiscriminator,
    "cgan": CGANKerasDiscriminator,
}


def build_generator(name: str, **kwargs):
    if name not in GENERATORS:
        raise ValueError(f"Unknown model '{name}'. Choose one of {list(GENERATORS)}")
    return GENERATORS[name](**kwargs)


def build_discriminator(name: str, **kwargs):
    if name not in DISCRIMINATORS:
        raise ValueError(
            f"Unknown discriminator '{name}'. Choose one of {list(DISCRIMINATORS)}"
        )
    return DISCRIMINATORS[name](**kwargs)
