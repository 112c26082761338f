"""Noisy-dataset renderer CLI.

Offline parity with the reference's three noise scripts
(noise_generation.py:41-81, sr_ganNoise.py:45-104, esrgan_addNoise.py:48-74):
walks ``--clean-dir`` (tree of ``<person>/<img>``), resizes to
``--image-size`` bicubic, applies every noise type of the chosen variant,
and writes ``<out-dir>/<noise_type>/<person>/<img>``.

The TPU-native training default doesn't need this (noise is injected
on-device per batch); this exists for dataset parity and offline export.
Noise runs batched on the accelerator via data.noise, not per-image NumPy.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from celebrity_image_denoiser_tpu.core import prng
from celebrity_image_denoiser_tpu.data import imageio, noise
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.cli.noise_gen")


def build_parser():
    p = argparse.ArgumentParser(description="Render a noisy dataset to disk")
    p.add_argument("--clean-dir", default="Clean_dataset")
    p.add_argument("--out-dir", default="Dataset_Noise")
    p.add_argument("--image-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--variant", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--types", nargs="+", default=list(noise.NOISE_TYPES))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr-size", type=int, nargs=2, default=None,
                   help="SRGAN mode (sr_ganNoise.py:45-104): write noisy "
                        "images downscaled to this LR size and clean HR "
                        "copies at --image-size into <out-dir>/clean_hr")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    paths = imageio.list_images(args.clean_dir)
    if not paths:
        logger.error("no images under %s", args.clean_dir)
        return 1
    keys = prng.key_stream(args.seed)
    w, h = args.image_size[1], args.image_size[0]

    noise_fns = {
        t: jax.jit(lambda k, b, t=t: noise.add_noise(k, b, t, args.variant))
        for t in args.types
    }
    import jax.image as jimage

    lr = args.lr_size
    if lr is not None:
        # hoisted out of the loop: a fresh lambda per batch would miss the
        # jit cache and retrace every iteration
        @jax.jit
        def lr_resize(x):
            return jimage.resize(
                x, (x.shape[0], lr[0], lr[1], x.shape[3]), "bicubic")

    for start in range(0, len(paths), args.batch):
        chunk = paths[start : start + args.batch]
        imgs, keep = [], []
        for p in chunk:
            try:
                imgs.append(imageio.to_float01(imageio.imread_rgb(p, (w, h))))
                keep.append(p)
            except Exception as e:  # warn-and-skip; never delete source files
                logger.warning("skipping %s: %s", p, e)
        if not imgs:
            continue
        batch = np.stack(imgs)
        for t in args.types:
            if args.variant == 3 and t == "poisson":
                # exact reference semantics: the poisson scale depends on
                # each image's unique-value count (esrgan_addNoise.py:25-28)
                # — computable here on the host, unlike the jitted on-device
                # path which approximates vals=256 (data.noise docstring)
                subkeys = jax.random.split(next(keys), len(batch))
                noisy = np.stack([
                    np.asarray(noise.poisson_v3_exact(k, img))
                    for k, img in zip(subkeys, batch)
                ])
            else:
                noisy = np.asarray(noise_fns[t](next(keys), batch))
            if lr is not None:
                # SRGAN layout: noisy side is downscaled to LR on device
                noisy = np.asarray(lr_resize(noisy))
            for img, src in zip(noisy, keep):
                rel = os.path.relpath(src, args.clean_dir)
                dst = os.path.join(args.out_dir, t, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                imageio.imwrite(dst, np.clip(img * 255, 0, 255).astype(np.uint8))
        if lr is not None:
            # clean HR copies alongside (sr_ganNoise writes an HR clean dir)
            for img, src in zip(batch, keep):
                rel = os.path.relpath(src, args.clean_dir)
                dst = os.path.join(args.out_dir, "clean_hr", rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                imageio.imwrite(dst, np.clip(img * 255, 0, 255).astype(np.uint8))
        logger.info("processed %d/%d", min(start + args.batch, len(paths)),
                    len(paths))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
