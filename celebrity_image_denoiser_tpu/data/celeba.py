"""CelebA-domain preprocessing helpers.

The reference's data domain is celebrity face crops (its dataset tree is
``Clean_dataset/<person>/<img>`` of pre-cropped faces).  These helpers cover
preparing that tree from raw CelebA-style images: the standard aligned
CelebA frame is 178×218; the common face crop takes the center 178×178 then
resizes to the model resolution (the reference's pipelines resize whatever
they are given to 256² bicubic, noise_generation.py:61).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from celebrity_image_denoiser_tpu.data import imageio
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.data.celeba")


def center_face_crop(img: np.ndarray) -> np.ndarray:
    """Center-square crop (the 178×218 → 178×178 CelebA convention,
    generalized to any aspect ratio)."""
    h, w = img.shape[:2]
    side = min(h, w)
    top = (h - side) // 2
    left = (w - side) // 2
    return img[top : top + side, left : left + side]


def prepare_clean_dataset(
    raw_dir: str,
    out_dir: str,
    image_size: Tuple[int, int] = (256, 256),
    person_from_parent: bool = True,
    limit: Optional[int] = None,
) -> int:
    """Raw images → ``<out_dir>/<person>/<img>.png`` at model resolution
    (center face crop + bicubic resize).  ``person_from_parent`` keeps the
    immediate parent directory as the identity folder; flat inputs all land
    under ``person0``.  Returns the number of images written."""
    from PIL import Image

    paths = imageio.list_images(raw_dir)
    if limit is not None:
        paths = paths[:limit]
    count = 0
    size = (image_size[1], image_size[0])
    for p in paths:
        try:
            img = imageio.imread_rgb(p)
        except Exception as e:  # skip-and-report
            logger.warning("skipping %s: %s", p, e)
            continue
        img = center_face_crop(img)
        person = (os.path.basename(os.path.dirname(p))
                  if person_from_parent else "person0")
        if os.path.abspath(os.path.dirname(p)) == os.path.abspath(raw_dir):
            person = "person0"
        stem = os.path.splitext(os.path.basename(p))[0]
        dst = os.path.join(out_dir, person, f"{stem}.png")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        k = 1
        while os.path.exists(dst):  # face.jpg + face.png must not collide
            dst = os.path.join(out_dir, person, f"{stem}_{k}.png")
            k += 1
        resized = np.asarray(
            Image.fromarray(img).resize(size, Image.Resampling.BICUBIC))
        imageio.imwrite(dst, resized)
        count += 1
    logger.info("prepared %d face crops under %s", count, out_dir)
    return count
