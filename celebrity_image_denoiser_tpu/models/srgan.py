"""SRGAN models (×4 super-resolution).

TPU-native re-implementation of ``SRGANGenerator`` (reference app.py:146-186,
trainingcode/srgan_code/sr_ganTrainGNew.py:19-51) and ``SRGANDiscriminator``
(sr_ganTrainGNew.py:54-80).  5 residual blocks (conv-BN-PReLU-conv-BN) with a
global skip through a ``mid`` conv; log2(scale) PixelShuffle(2) upsample
stages; 9×9 head/tail convs; tanh output.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from celebrity_image_denoiser_tpu import nn


class SRGANGenerator(nn.Module):
    def __init__(self, scale_factor: int = 4):
        super().__init__()
        if scale_factor < 1 or (scale_factor & (scale_factor - 1)) != 0:
            # power-of-two validation mirrors app.py:149-150
            raise ValueError(
                f"scale_factor must be a power of two (got {scale_factor})"
            )
        self.scale_factor = scale_factor
        self.add("initial", nn.Sequential(
            nn.Conv2d(3, 64, 9, padding=4), nn.PReLU(),
        ))
        blocks = []
        for _ in range(5):
            blocks.append(nn.Sequential(
                nn.Conv2d(64, 64, 3, padding=1),
                nn.BatchNorm2d(64),
                nn.PReLU(),
                nn.Conv2d(64, 64, 3, padding=1),
                nn.BatchNorm2d(64),
            ))
        self.add("res_blocks", nn.Sequential(*blocks))
        self.add("mid", nn.Conv2d(64, 64, 3, padding=1))
        ups = []
        for _ in range(int(math.log2(scale_factor))):
            ups += [nn.Conv2d(64, 256, 3, padding=1), nn.PixelShuffle(2), nn.PReLU()]
        self.add("upscale", nn.Sequential(*ups))
        self.add("final", nn.Conv2d(64, 3, 9, padding=4))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        x0 = self.call("initial", params, state, ns, x, train=train)
        res = self.call("res_blocks", params, state, ns, x0, train=train)
        x = self.call("mid", params, state, ns, res, train=train) + x0
        x = self.call("upscale", params, state, ns, x, train=train)
        x = self.call("final", params, state, ns, x, train=train)
        return jnp.tanh(x), ns


class SRGANDiscriminator(nn.Module):
    """6-conv ladder 3→64→64(s2)→128→128(s2)→256 + BN/LeakyReLU, global avg
    pool, 1×1 convs 256→512→1, sigmoid (sr_ganTrainGNew.py:54-80)."""

    def __init__(self):
        super().__init__()
        self.add("model", nn.Sequential(
            nn.Conv2d(3, 64, 3, padding=1),
            nn.LeakyReLU(0.2),
            nn.Conv2d(64, 64, 3, stride=2, padding=1),
            nn.BatchNorm2d(64),
            nn.LeakyReLU(0.2),
            nn.Conv2d(64, 128, 3, padding=1),
            nn.BatchNorm2d(128),
            nn.LeakyReLU(0.2),
            nn.Conv2d(128, 128, 3, stride=2, padding=1),
            nn.BatchNorm2d(128),
            nn.LeakyReLU(0.2),
            nn.Conv2d(128, 256, 3, padding=1),
            nn.BatchNorm2d(256),
            nn.LeakyReLU(0.2),
            nn.GlobalAvgPool(),
            nn.Conv2d(256, 512, 1),
            nn.LeakyReLU(0.2),
            nn.Conv2d(512, 1, 1),
            nn.Sigmoid(),
        ))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        y = self.call("model", params, state, ns, x, train=train)
        return jnp.reshape(y, (-1,)), ns
