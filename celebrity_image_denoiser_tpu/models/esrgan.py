"""ESRGAN models.

Despite the name, the reference's ESRGAN generator is a same-resolution
denoiser: 9×9 head conv + PReLU, 8 additive residual blocks
(conv-BN-PReLU-conv-BN), 9×9 tail conv, global additive skip, **no output
activation and no upscale** (reference trainingcode/esrgan_code/models.py:
19-34, app.py:203-218).  The discriminator is 4 stride-2 convs + LeakyReLU
then flatten → Linear → 1 logit (models.py:36-70, paired with
BCEWithLogits at esrgan_train.py:64).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from celebrity_image_denoiser_tpu import nn


class ResidualBlock(nn.Module):
    """x + conv-BN-PReLU-conv-BN(x) (models.py:6-17)."""

    def __init__(self, channels: int):
        super().__init__()
        self.add("block", nn.Sequential(
            nn.Conv2d(channels, channels, 3, 1, 1),
            nn.BatchNorm2d(channels),
            nn.PReLU(),
            nn.Conv2d(channels, channels, 3, 1, 1),
            nn.BatchNorm2d(channels),
        ))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        y = self.call("block", params, state, ns, x, train=train)
        return x + y, ns


class ESRGANGenerator(nn.Module):
    def __init__(self, num_residuals: int = 8):
        super().__init__()
        self.add("initial", nn.Sequential(
            nn.Conv2d(3, 64, 9, 1, 4), nn.PReLU(),
        ))
        self.add("residuals", nn.Sequential(
            *[ResidualBlock(64) for _ in range(num_residuals)]
        ))
        self.add("final", nn.Conv2d(64, 3, 9, 1, 4))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        x1 = self.call("initial", params, state, ns, x, train=train)
        x2 = self.call("residuals", params, state, ns, x1, train=train)
        y = self.call("final", params, state, ns, x1 + x2, train=train)
        return y, ns


class ESRGANDiscriminator(nn.Module):
    """4 stride-2 convs (3→64→128→256→512) + LeakyReLU, flatten, Linear→1
    logit.  The reference sizes the Linear by a dummy forward
    (models.py:53-58); here the flatten width is computed statically from
    ``input_hw`` (spatial /16 after four stride-2 convs with p=1)."""

    def __init__(self, input_hw: Tuple[int, int] = (256, 256)):
        super().__init__()
        h, w = input_hw
        for _ in range(4):
            h = (h + 2 - 3) // 2 + 1
            w = (w + 2 - 3) // 2 + 1
        self.flat_dim = 512 * h * w
        self.add("conv1", nn.Conv2d(3, 64, 3, stride=2, padding=1))
        self.add("conv2", nn.Conv2d(64, 128, 3, stride=2, padding=1))
        self.add("conv3", nn.Conv2d(128, 256, 3, stride=2, padding=1))
        self.add("conv4", nn.Conv2d(256, 512, 3, stride=2, padding=1))
        self.add("act", nn.LeakyReLU(0.2))
        self.add("fc", nn.Linear(self.flat_dim, 1))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        for name in ("conv1", "conv2", "conv3", "conv4"):
            x = self.call(name, params, state, ns, x, train=train)
            x = self.call("act", params, state, ns, x, train=train)
        # torch flattens NCHW (models.py:69); transpose so imported fc
        # weights see the same feature ordering.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        y = self.call("fc", params, state, ns, x, train=train)
        return jnp.reshape(y, (-1,)), ns
