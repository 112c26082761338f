"""Denoise GAN models — the flagship family.

TPU-native (NHWC, functional) re-implementation of the reference's 2-level
U-Net ``DenoiseGenerator`` (reference backend/app.py:39-103, identical copies
at trainingcode/denoise_gan_code/training.py:19-74) and the patch→global
``DenoiseDiscriminator`` (training.py:77-98).

The serving copy's skip-size cropping (app.py:90-92,97-99) is preserved: when
the upsampled decoder tensor is smaller than the encoder skip (odd spatial
sizes after pooling), the skip is cropped to match.  Shapes are static under
jit, so the crop compiles away to a slice.
"""

from __future__ import annotations

import jax.numpy as jnp

from celebrity_image_denoiser_tpu import nn


class DenoiseGenerator(nn.Module):
    """(3→64→64) ↓ (64→128→128) ↓ bottleneck(128→256→256), ConvTranspose
    ups + skip-concats, 3×3 convs, ReLU, tanh output.  Input spatial dims
    should be divisible by 4 (serving pads to that, app.py:383-385)."""

    def __init__(self):
        super().__init__()
        self.add("down1", nn.Sequential(
            nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(),
            nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        ))
        self.add("pool1", nn.MaxPool2d(2, 2))
        self.add("down2", nn.Sequential(
            nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        ))
        self.add("pool2", nn.MaxPool2d(2, 2))
        self.add("bottleneck", nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
        ))
        self.add("up2", nn.ConvTranspose2d(256, 128, 2, stride=2))
        self.add("upconv2", nn.Sequential(
            nn.Conv2d(256, 128, 3, padding=1), nn.ReLU(),
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
        ))
        self.add("up1", nn.ConvTranspose2d(128, 64, 2, stride=2))
        self.add("upconv1", nn.Sequential(
            nn.Conv2d(128, 64, 3, padding=1), nn.ReLU(),
            nn.Conv2d(64, 3, 3, padding=1),
        ))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        e1 = self.call("down1", params, state, ns, x, train=train)
        p1 = self.call("pool1", params, state, ns, e1, train=train)
        e2 = self.call("down2", params, state, ns, p1, train=train)
        p2 = self.call("pool2", params, state, ns, e2, train=train)
        b = self.call("bottleneck", params, state, ns, p2, train=train)

        d2 = self.call("up2", params, state, ns, b, train=train)
        if d2.shape[1:3] != e2.shape[1:3]:  # skip-crop, app.py:90-92
            e2 = e2[:, : d2.shape[1], : d2.shape[2], :]
        d2 = jnp.concatenate([d2, e2], axis=-1)
        d2 = self.call("upconv2", params, state, ns, d2, train=train)

        d1 = self.call("up1", params, state, ns, d2, train=train)
        if d1.shape[1:3] != e1.shape[1:3]:  # skip-crop, app.py:97-99
            e1 = e1[:, : d1.shape[1], : d1.shape[2], :]
        d1 = jnp.concatenate([d1, e1], axis=-1)
        d1 = self.call("upconv1", params, state, ns, d1, train=train)
        return jnp.tanh(d1), ns


class DenoiseDiscriminator(nn.Module):
    """4-conv patch→global classifier, BN + LeakyReLU(0.2), global avg pool,
    1×1 conv → sigmoid scalar per sample (training.py:77-98).  Returns (N,)."""

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
            nn.GlobalAvgPool(),
            nn.Conv2d(128, 1, 1),
            nn.Sigmoid(),
        ))

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        y = self.call("model", params, state, ns, x, train=train)
        return jnp.reshape(y, (-1,)), ns
