"""cGAN — torch architecture (serving fallback backend).

Re-implementation of ``CGANGenerator`` (reference app.py:106-143): label
embedding (10 classes, latent 100) → Linear → 8×8×128 → BN/ReLU →
3×ConvTranspose(k4 s2 p1) ladder 128→128→64→32 → 3×3 conv → tanh.

Note (documented reference quirk, SURVEY.md §2): this torch architecture does
NOT match the trained Keras cGAN the API actually serves; it exists only as
the ``cgan_backend=torch`` fallback.  Its image-condition path
(app.py:139-143) concatenates a 3-channel image with a 3-channel condition
and feeds 6 channels into BatchNorm2d(128) — a latent shape bug in the
reference that raises at runtime there and raises here too.
"""

from __future__ import annotations

import jax.numpy as jnp

from celebrity_image_denoiser_tpu import nn


class CGANTorchGenerator(nn.Module):
    def __init__(self, n_classes: int = 10, latent_dim: int = 100):
        super().__init__()
        self.n_classes = n_classes
        self.latent_dim = latent_dim
        self.init_size = 8
        self.add("label_emb", nn.Embedding(n_classes, latent_dim))
        self.add("l1", nn.Linear(latent_dim + latent_dim, 128 * self.init_size ** 2))
        self.add("model", nn.Sequential(
            nn.BatchNorm2d(128),
            nn.ReLU(),
            nn.ConvTranspose2d(128, 128, 4, stride=2, padding=1),
            nn.BatchNorm2d(128),
            nn.ReLU(),
            nn.ConvTranspose2d(128, 64, 4, stride=2, padding=1),
            nn.BatchNorm2d(64),
            nn.ReLU(),
            nn.ConvTranspose2d(64, 32, 4, stride=2, padding=1),
            nn.BatchNorm2d(32),
            nn.ReLU(),
            nn.Conv2d(32, 3, 3, stride=1, padding=1),
        ))

    def forward(self, params, state, z, cond=None, *, train: bool = False):
        if cond is None:
            raise ValueError("cGAN requires a condition (label or tensor)")
        ns = {}
        if cond.ndim == 1:
            # label path: z (N, 1, 1, latent) or (N, latent); embed label,
            # concat, project to 8×8×128 (app.py:132-138)
            emb = self.call("label_emb", params, state, ns, cond, train=train)
            zf = jnp.reshape(z, (z.shape[0], -1))
            h = jnp.concatenate([zf, emb], axis=1)
            h = self.call("l1", params, state, ns, h, train=train)
            # torch reshapes to NCHW (N,128,8,8); NHWC equivalent keeps the
            # same per-channel feature assignment for weight-import parity.
            h = jnp.reshape(h, (h.shape[0], 128, self.init_size, self.init_size))
            h = jnp.transpose(h, (0, 2, 3, 1))
            y = self.call("model", params, state, ns, h, train=train)
            return jnp.tanh(y), ns
        # image-condition path — faithfully reproduces the reference's
        # channel-mismatch bug (6 channels into BatchNorm2d(128)); raises.
        x = jnp.concatenate([z, cond], axis=-1)
        y = self.call("model", params, state, ns, x, train=train)
        return jnp.tanh(y), ns
