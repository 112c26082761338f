"""Export a trained checkpoint back to the reference's formats.

Completes the migration round-trip at the CLI surface (ckpt/export.py is
the library layer): a user who trained here can produce a ``.pth`` the
reference's tolerant loader accepts (``{"generator": state_dict}`` —
app.py:257-274, denoisegan_eval.py:68-69) or, for the cGAN family, a
Keras-3 ``.keras`` zip loadable by ``tf.keras.models.load_model``
(training5Pbar.py:206 saves the same artifact upstream).

    python -m celebrity_image_denoiser_tpu.cli.export --model denoise \\
        --checkpoint runs/denoise/checkpoint/epoch_499 --out denoise_epoch_499.pth
    python -m celebrity_image_denoiser_tpu.cli.export --model cgan \\
        --checkpoint runs/cgan/checkpoint/best --format keras --out cgan.keras
"""

from __future__ import annotations

import argparse
import os

from celebrity_image_denoiser_tpu import models as M
from celebrity_image_denoiser_tpu.core import prng
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.cli.export")

_FAMILIES = ["denoise", "srgan", "esrgan", "dncnn", "cgan", "cgan_torch"]


def build_parser():
    p = argparse.ArgumentParser(
        description="Export a native checkpoint to .pth / .keras")
    p.add_argument("--model", required=True, choices=_FAMILIES)
    p.add_argument("--checkpoint", required=True,
                   help="native npz checkpoint dir (a 'generator' section; "
                        "cli.train / scripts/train_serving_weights.py output)")
    p.add_argument("--out", required=True, help="output .pth / .keras path")
    p.add_argument("--format", default=None, choices=["pth", "keras"],
                   help="default: by --out extension (.pth / .keras)")
    p.add_argument("--key", default="generator",
                   choices=["generator", "state_dict", "G"],
                   help=".pth dict key (any of the reference loader's "
                        "accepted keys, app.py:257-274)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    fmt = args.format or ("keras" if args.out.endswith(".keras") else "pth")
    if fmt == "keras" and args.model != "cgan":
        raise SystemExit(".keras export is the cGAN generator's format "
                         "(the reference only ever saves cgan as .keras); "
                         "use --format pth for the torch families")
    if fmt == "pth" and args.model == "cgan":
        # A cgan .pth would carry CGANKerasGenerator-tree keys no reference
        # torch loader matches (app.py:257-274) — the tolerant loader would
        # silently fall back to random init. The torch-layout cGAN is a
        # separate family.
        raise SystemExit("the Keras cGAN exports as .keras only; for a "
                         "torch-loadable cGAN use --model cgan_torch")

    from celebrity_image_denoiser_tpu.ckpt import load_checkpoint

    model = M.build_generator(args.model)
    params, state = model.init(prng.key(0))
    sections, meta = load_checkpoint(args.checkpoint)
    if "generator" not in sections:
        raise SystemExit(
            f"{args.checkpoint} has no 'generator' section "
            f"(found: {sorted(sections)})")
    params = sections["generator"]
    state = sections.get("generator_state", state) or state

    out_dir = os.path.dirname(os.path.abspath(args.out))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    if fmt == "keras":
        from celebrity_image_denoiser_tpu.ckpt import export_keras_cgan

        export_keras_cgan(params, state, args.out)
    else:
        from celebrity_image_denoiser_tpu.ckpt import save_pth

        save_pth(model, params, state, args.out, key=args.key)
    epoch = meta.get("epoch")
    logger.info("exported %s -> %s (%s%s)", args.checkpoint, args.out, fmt,
                f", epoch {epoch}" if epoch is not None else "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
