"""Per-epoch visual spot-checks.

Port of ``combine_test_images`` (reference training.py:301-320): noisy and
denoised side-by-side on a white canvas with "Noisy"/"Denoised" labels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def combine_test_images(
    noisy: np.ndarray, denoised: np.ndarray, output_size: Tuple[int, int] = (256, 256)
):
    """noisy/denoised: uint8 HWC arrays (or PIL images); returns PIL image."""
    from PIL import Image, ImageDraw, ImageFont

    def to_pil(x):
        if isinstance(x, np.ndarray):
            return Image.fromarray(np.asarray(x, np.uint8))
        return x

    noisy_img = to_pil(noisy).resize(output_size, Image.Resampling.BICUBIC)
    denoised_img = to_pil(denoised).resize(output_size, Image.Resampling.BICUBIC)
    combined = Image.new("RGB", (output_size[0] * 2, output_size[1] + 30),
                         (255, 255, 255))
    combined.paste(noisy_img, (0, 30))
    combined.paste(denoised_img, (output_size[0], 30))
    draw = ImageDraw.Draw(combined)
    try:
        font = ImageFont.truetype("arial.ttf", 20)
    except Exception:
        font = ImageFont.load_default()
    draw.text((output_size[0] // 4, 5), "Noisy", fill=(0, 0, 0), font=font)
    draw.text((output_size[0] + output_size[0] // 4, 5), "Denoised",
              fill=(0, 0, 0), font=font)
    return combined


def triptych(noisy: np.ndarray, generated: np.ndarray, clean: np.ndarray,
             path: str) -> None:
    """Noisy / generated / clean 3-panel PNG — the per-epoch visual used by
    the ESRGAN and cGAN trainers (esrgan_train.py:71-81,
    training5Pbar.py:112-128).  Inputs: float [0,1] HWC."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(7.5, 2.5))
    for ax, img, title in zip(axs, (noisy, generated, clean),
                              ("Noisy", "Generated", "Clean")):
        ax.imshow(np.clip(img, 0, 1))
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    plt.tight_layout()
    fig.savefig(path)
    plt.close(fig)
