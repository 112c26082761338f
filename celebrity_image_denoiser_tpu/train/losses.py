"""Loss functions used by the four GAN families.

Conventions match the reference exactly:
    mse / mae           — mean over all elements (torch MSELoss / keras MAE)
    bce                 — on probabilities (torch BCELoss; D ends in sigmoid)
    bce_with_logits     — ESRGAN's D (esrgan_train.py:64, models.py logits)
    vgg_perceptual      — MSE over frozen VGG features (training.py:101-111)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a - b) ** 2)


def mae(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def bce(pred_prob: jax.Array, target: jax.Array) -> jax.Array:
    """Binary cross-entropy on probabilities, clamped like torch BCELoss."""
    p = jnp.clip(pred_prob, 1e-7, 1 - 1e-7)
    t = jnp.broadcast_to(target, p.shape).astype(p.dtype)
    return -jnp.mean(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))


def bce_with_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    t = jnp.broadcast_to(target, logits.shape).astype(logits.dtype)
    # numerically-stable log-sigmoid formulation
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def make_vgg_perceptual(vgg_model, vgg_params, vgg_state, to_unit=False):
    """Returns loss(x, y) = MSE(vgg(x), vgg(y)) with frozen features —
    ``VGGPerceptualLoss`` (training.py:101-111).  Inputs arrive in the
    model's native range ([-1,1] for SRGAN); the reference feeds torchvision
    VGG unshifted (a quirk we keep for that tower).  ``to_unit=True`` maps
    [-1,1]→[0,1] first — required for the in-repo DAE tower
    (weights/perceptual), which was trained on raw [0,1] inputs."""

    def loss(x, y):
        if to_unit:
            x = x * 0.5 + 0.5
            y = y * 0.5 + 0.5
        fx, _ = vgg_model.apply(vgg_params, vgg_state, x)
        fy, _ = vgg_model.apply(vgg_params, vgg_state, y)
        # f32 reduction even when the tower ran bf16 (mixed-precision
        # training casts the inputs down): the mean is over tens of
        # millions of feature elements — the elementwise diff fuses into
        # the reduction, so this costs no extra HBM bytes
        return mse(fx.astype(jnp.float32), fy.astype(jnp.float32))

    return loss
