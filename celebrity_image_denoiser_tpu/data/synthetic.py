"""On-device synthetic clean-image generator (jit/vmap/scan friendly).

The reference trains on a CelebA-style photo corpus read from disk
(trainingcode/denoise_gan_code/training.py:113-140).  This container has no
image corpus and a ~25 MB/s host->device link, so the shipped serving
checkpoints (weights/) are trained on images synthesized *on the TPU* from a
PRNG key: smooth low-frequency color fields, antialiased geometric shapes
(sharp edges), mid-frequency texture and a radial vignette — the statistics a
denoiser needs (flat regions to smooth, edges to preserve).  Everything here
is pure jax with static shapes, usable inside jit/scan so training never
touches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shape_layer(key, size: int):
    """One antialiased random shape: axis-aligned rectangle or ellipse.

    Returns (mask [H,W,1] in [0,1], color [3]).  The mask edge is a ~1.5 px
    sigmoid over the signed distance so downstream resizes don't alias.
    """
    k_kind, k_pos, k_dim, k_col = jax.random.split(key, 4)
    yy, xx = jnp.mgrid[0:size, 0:size].astype(jnp.float32)
    cy, cx = jax.random.uniform(k_pos, (2,), minval=0.15 * size,
                                maxval=0.85 * size)
    hh, ww = jax.random.uniform(k_dim, (2,), minval=0.06 * size,
                                maxval=0.30 * size)
    # signed distances (negative inside) for both candidate shapes
    d_rect = jnp.maximum(jnp.abs(yy - cy) - hh, jnp.abs(xx - cx) - ww)
    d_ell = (jnp.sqrt(((yy - cy) / hh) ** 2 + ((xx - cx) / ww) ** 2) - 1.0) \
        * jnp.minimum(hh, ww)
    use_rect = jax.random.bernoulli(k_kind)
    d = jnp.where(use_rect, d_rect, d_ell)
    mask = jax.nn.sigmoid(-d / 1.5)[..., None]
    color = jax.random.uniform(k_col, (3,))
    return mask, color


def _one_image(key, size: int, num_shapes: int):
    (k_base, k_mid, k_shapes, k_vig,
     k_tex, k_amp) = jax.random.split(key, 6)
    # smooth low-frequency color field (blobby "skin/background" regions)
    base = jax.image.resize(
        jax.random.uniform(k_base, (6, 6, 3)), (size, size, 3), "cubic")
    # mid-frequency texture, small amplitude
    mid = jax.image.resize(
        jax.random.uniform(k_mid, (24, 24, 3), minval=-0.12, maxval=0.12),
        (size, size, 3), "linear")
    img = base + mid

    def paint(img, k):
        mask, color = _shape_layer(k, size)
        return img * (1.0 - mask) + color * mask, None

    img, _ = jax.lax.scan(paint, img, jax.random.split(k_shapes, num_shapes))

    # fine texture (hair/fabric/skin-grain stand-in): two band-limited
    # layers at quarter and half resolution, per-image random amplitude
    # (sometimes ~0, so flat-image statistics stay in the corpus too).
    # Without this the corpus is so smooth that bicubic ×4 upsampling is
    # near-optimal and the SR families have nothing to learn.
    amp = jax.random.uniform(k_amp, (2,), minval=0.0, maxval=0.12)
    kq, kh = jax.random.split(k_tex)
    tex_q = jax.image.resize(
        jax.random.uniform(kq, (size // 4, size // 4, 3), minval=-1.0,
                           maxval=1.0), (size, size, 3), "linear")
    tex_h = jax.image.resize(
        jax.random.uniform(kh, (size // 2, size // 2, 3), minval=-1.0,
                           maxval=1.0), (size, size, 3), "linear")
    # luminance-coupled so texture reads as surface detail, not color fuzz
    tex = (amp[0] * tex_q + amp[1] * tex_h)
    img = img + tex * jnp.mean(img, axis=-1, keepdims=True)

    # radial vignette (portrait-photo prior), random strength
    yy, xx = jnp.mgrid[0:size, 0:size].astype(jnp.float32)
    r2 = ((yy / size - 0.5) ** 2 + (xx / size - 0.5) ** 2) * 2.0
    strength = jax.random.uniform(k_vig, (), minval=0.0, maxval=0.35)
    img = img * (1.0 - strength * r2)[..., None]
    return jnp.clip(img, 0.0, 1.0)


def synth_clean_batch(key: jax.Array, n: int, size: int = 128,
                      num_shapes: int = 4) -> jax.Array:
    """[n, size, size, 3] float32 clean images in [0, 1], fully on device."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: _one_image(k, size, num_shapes))(keys)


def calibration_batch(tanh: bool, size: int = 128,
                      sigmas=(0.12,)) -> jax.Array:
    """Int8-PTQ calibration batch: 8 synthetic noisy images per σ in the
    family's serving domain.

    Shared by serve/handlers._maybe_quantize and bench.py so the
    benchmarked int8 program is the served one (advisor r3 finding #4).

    The σ list is PER FAMILY, by receipt (r4 CPU probe): a 3-σ spread
    (0.05/0.12/0.25) moves ESRGAN's int8-vs-float held-out gain delta from
    −0.107 to −0.054 dB and buys it agreement margin (its gate is the
    tightest at ~40 dB), but the same spread costs DnCNN 6 dB of agreement
    (the σ=0.25 images inflate its residual-path ranges ~2×, one whole
    bit of step size, 40→34 dB on the serving fixture).  Default stays the
    single serving-typical σ; handlers passes the 3-σ list for esrgan."""
    parts = []
    for i, sigma in enumerate(sigmas):
        seed = 10 * i
        clean01 = synth_clean_batch(jax.random.PRNGKey(seed), 8, size)
        noisy01 = jnp.clip(
            clean01 + sigma * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                                clean01.shape), 0.0, 1.0)
        parts.append(noisy01)
    batch01 = jnp.concatenate(parts, axis=0)
    return batch01 * 2.0 - 1.0 if tanh else batch01


def lr_batch(seed: int, n: int, hw: int, sigma: float = 0.0) -> jax.Array:
    """[-1,1] low-resolution images: clean synthetics rendered at 4×hw and
    bicubic-downsized (the SRGAN serving fixture's LR recipe,
    serve/quality.py), with optional mild sensor noise."""
    from celebrity_image_denoiser_tpu.ops.resize import resize

    clean01 = synth_clean_batch(jax.random.PRNGKey(seed), n, 4 * hw)
    lr01 = jnp.clip(resize(clean01, (hw, hw), method="bicubic"), 0.0, 1.0)
    if sigma:
        lr01 = jnp.clip(
            lr01 + sigma * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                             lr01.shape), 0.0, 1.0)
    return lr01 * 2.0 - 1.0


def srgan_calibration_batch() -> jax.Array:
    """SRGAN's per-family int8 calibration: the upscaler's serving inputs
    are LOW-RESOLUTION images (the user uploads an LR image for a ×4
    upscale), not the full-res noisy images the shared recipe synthesizes.
    Cross-distribution receipts (benchmarks/srgan_calib_probe.py + the
    round-4 cross probe, shipped weights, held-out):

    | calibration | LR agreement | noisy agreement |
    |---|---|---|
    | shared noisy recipe | 50.8 dB | 32.1 dB |
    | LR-only | 57.9 | 21.5 (brittle: clipped ranges) |
    | LR + mild-noise + noisy crops (this) | 52.8 | 33.6 |

    The mix strictly dominates the shared recipe on BOTH distributions:
    8 clean LR 64² + 4 mild-noise LR + 4 noisy full-res crops, tanh
    domain."""
    return jnp.concatenate([
        lr_batch(0, 8, 64),
        lr_batch(20, 4, 64, sigma=0.05),
        calibration_batch(True)[:4, :64, :64, :],
    ])


def heldout_noisy_batch(tanh: bool, size: int = 48,
                        sigmas=(0.08, 0.18)) -> jax.Array:
    """Held-out agreement-probe batch for the quantization receipts: same
    synthesis recipe as ``calibration_batch`` but DISJOINT seeds and
    off-calibration sigmas, so receipts aren't measured on calibration
    pixels.  Shared by benchmarks/bias_correct_probe.py and
    benchmarks/esrgan_s8_probe.py — the kernel_notes tables compare their
    numbers, so the probe definition must not drift between them."""
    parts = []
    for i, sigma in enumerate(sigmas):
        clean01 = synth_clean_batch(jax.random.PRNGKey(1000 + i), 4, size)
        parts.append(jnp.clip(
            clean01 + sigma * jax.random.normal(
                jax.random.PRNGKey(2000 + i), clean01.shape), 0.0, 1.0))
    batch01 = jnp.concatenate(parts, axis=0)
    return batch01 * 2.0 - 1.0 if tanh else batch01
