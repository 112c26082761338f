"""cGAN models — Keras architecture (the one actually served).

The reference ships ``weights/cgan_epoch_500.keras`` and serving defaults to
that Keras backend (reference app.py:469, frontend forces
``cgan_backend=keras`` at page.tsx:61).  The architecture is the
encoder-decoder from ``build_generator`` (trainingcode/cgan_code/
training5Pbar.py:16-35): Conv 64 k4 s2 → Conv 128 k4 s2 + BN → ConvT 128 k4
s2 + BN → ConvT 64 k4 s2 + BN → Conv 3 k3 tanh, LeakyReLU(0.2) throughout,
256×256×3 in [-1, 1].  The discriminator (training5Pbar.py:38-54) is Conv 64
s2 → Conv 128 s2 + BN → Conv 256 s2 + BN → Flatten → Dense 1 sigmoid.

Keras conventions preserved: 'same' padding for k4 s2 on even inputs is a
symmetric pad of 1; BN uses eps 1e-3 / momentum 0.99; glorot_uniform weight
init with zero biases.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from celebrity_image_denoiser_tpu import nn


class CGANKerasGenerator(nn.Module):
    def __init__(self):
        super().__init__()
        self.add("model", nn.Sequential(
            nn.Conv2d(3, 64, 4, stride=2, padding=1, weight_init="keras"),
            nn.LeakyReLU(0.2),
            nn.Conv2d(64, 128, 4, stride=2, padding=1, weight_init="keras"),
            nn.BatchNorm2d(128, keras=True),
            nn.LeakyReLU(0.2),
            nn.ConvTranspose2d(128, 128, 4, stride=2, padding=1, weight_init="keras"),
            nn.BatchNorm2d(128, keras=True),
            nn.LeakyReLU(0.2),
            nn.ConvTranspose2d(128, 64, 4, stride=2, padding=1, weight_init="keras"),
            nn.BatchNorm2d(64, keras=True),
            nn.LeakyReLU(0.2),
            nn.Conv2d(64, 3, 3, padding=1, weight_init="keras"),
            nn.Tanh(),
        ))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        y = self.call("model", params, state, ns, x, train=train)
        return y, ns


class CGANKerasDiscriminator(nn.Module):
    """Flatten feeds a Dense over NHWC features — Keras flattening order is
    already HWC-major, so no transpose is needed before the Linear."""

    def __init__(self, input_hw: Tuple[int, int] = (256, 256)):
        super().__init__()
        h, w = input_hw
        self.flat_dim = 256 * (h // 8) * (w // 8)
        self.add("features", nn.Sequential(
            nn.Conv2d(3, 64, 4, stride=2, padding=1, weight_init="keras"),
            nn.LeakyReLU(0.2),
            nn.Conv2d(64, 128, 4, stride=2, padding=1, weight_init="keras"),
            nn.BatchNorm2d(128, keras=True),
            nn.LeakyReLU(0.2),
            nn.Conv2d(128, 256, 4, stride=2, padding=1, weight_init="keras"),
            nn.BatchNorm2d(256, keras=True),
            nn.LeakyReLU(0.2),
            nn.Flatten(),
        ))
        self.add("dense", nn.Linear(self.flat_dim, 1, weight_init="keras"))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        y = self.call("features", params, state, ns, x, train=train)
        y = self.call("dense", params, state, ns, y, train=train)
        return jnp.reshape(jax.nn.sigmoid(y), (-1,)), ns
