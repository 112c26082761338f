"""Batch / iterative inference CLI.

Parity with the reference inference scripts:
* batch mode (denoisegan_eval.py:62-103): load checkpoint, walk a directory,
  resize to 256² bicubic, normalize, forward, denorm, save.
* ``--iterations N`` (denoise_eavl_iter.py:62-114): feed the output back
  through the generator N times, saving every intermediate.
Optionally reports PSNR/SSIM against a clean directory.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from celebrity_image_denoiser_tpu import models as M
from celebrity_image_denoiser_tpu import metrics
from celebrity_image_denoiser_tpu.core import prng
from celebrity_image_denoiser_tpu.data import imageio
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.cli.eval")


def build_parser():
    p = argparse.ArgumentParser(description="Batch denoise a directory")
    p.add_argument("--model", default="denoise",
                   choices=["denoise", "srgan", "esrgan", "dncnn"])
    p.add_argument("--checkpoint", required=False,
                   help=".pth or native npz checkpoint dir (default: the "
                        "shipped weights/ checkpoint for the model; a loud "
                        "warning fires if none exists)")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--clean-dir", help="optional: compute PSNR/SSIM vs this")
    p.add_argument("--image-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--iterations", type=int, default=1,
                   help=">1 = iterative denoising, saves intermediates")
    return p


def _discover_checkpoint(name: str) -> str | None:
    """Find a shipped checkpoint for this model (same layout serving uses:
    weights/<ref .pth filename> or the native weights/<name>/ npz dir)."""
    from celebrity_image_denoiser_tpu.serve.handlers import (
        _CKPT_CANDIDATES,
        default_weights_dir,
    )

    wd = default_weights_dir()
    fname = _CKPT_CANDIDATES.get(name, (None, None))[0]
    if fname and os.path.exists(os.path.join(wd, fname)):
        return os.path.join(wd, fname)
    npz_dir = os.path.join(wd, name)
    if os.path.isdir(npz_dir):
        return npz_dir
    return None


def load_model(name: str, checkpoint: str | None):
    model = M.build_generator(name)
    params, state = model.init(prng.key(0))
    if not checkpoint:
        checkpoint = _discover_checkpoint(name)
        if checkpoint:
            logger.info("--checkpoint not given; using shipped %s", checkpoint)
        else:
            # random-init "denoising" writes garbage — make that unmissable
            logger.warning(
                "NO CHECKPOINT: --checkpoint not given and no shipped "
                "weights found for %r — outputs will be RANDOM-INIT noise, "
                "not denoised images.", name)
    if checkpoint:
        if checkpoint.endswith(".pth"):
            from celebrity_image_denoiser_tpu.ckpt import load_pth_safely

            params, state = load_pth_safely(model, checkpoint, params, state)
        else:
            from celebrity_image_denoiser_tpu.ckpt import load_checkpoint

            sections, _ = load_checkpoint(checkpoint)
            params = sections.get("generator", params)
            state = sections.get("generator_state", state) or state
    return model, params, state


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    model, params, state = load_model(args.model, args.checkpoint)
    fwd = jax.jit(lambda x: model.apply(params, state, x, train=False)[0])
    os.makedirs(args.output_dir, exist_ok=True)
    normalize = args.model in ("denoise", "srgan")

    paths = imageio.list_images(args.input_dir)
    psnrs, ssims = [], []
    for p in paths:
        try:
            arr = imageio.to_float01(
                imageio.imread_rgb(p, (args.image_size[1], args.image_size[0])))
        except Exception as e:
            logger.warning("skipping %s: %s", p, e)
            continue
        x = arr * 2 - 1 if normalize else arr
        rel = os.path.relpath(p, args.input_dir)
        stem, ext = os.path.splitext(rel)
        out01 = None
        for it in range(args.iterations):
            y = np.asarray(fwd(jnp.asarray(x[None])))[0]
            out01 = np.clip(y * 0.5 + 0.5, 0, 1) if normalize else np.clip(y, 0, 1)
            suffix = f"_iter{it + 1}" if args.iterations > 1 else ""
            dst = os.path.join(args.output_dir, f"{stem}{suffix}{ext or '.png'}")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            imageio.imwrite(dst, (out01 * 255).astype(np.uint8))
            x = out01 * 2 - 1 if normalize else out01
        if args.clean_dir:
            cpath = os.path.join(args.clean_dir, os.path.relpath(p, args.input_dir))
            if os.path.exists(cpath):
                clean = imageio.to_float01(imageio.imread_rgb(
                    cpath, (out01.shape[1], out01.shape[0])))
                psnrs.append(float(metrics.psnr(jnp.asarray(out01),
                                                jnp.asarray(clean), data_range=1.0)))
                ssims.append(float(metrics.ssim(jnp.asarray(out01),
                                                jnp.asarray(clean), data_range=1.0)))
    logger.info("wrote %d outputs to %s", len(paths), args.output_dir)
    if psnrs:
        logger.info("PSNR %.3f  SSIM %.4f (n=%d)",
                    float(np.mean(psnrs)), float(np.mean(ssims)), len(psnrs))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
