"""SRGAN int8 calibration-distribution probe.

Serving feeds SRGAN low-resolution crops of (mostly clean) images — the
user uploads an LR image and gets a ×4 upscale — but the shared int8
calibration recipe (data/synthetic.calibration_batch) synthesizes
FULL-RES NOISY images, which is the right distribution for the denoise
families, not for an upscaler.  This probe measures whether an
LR-matched calibration batch (bicubic-downsampled clean synthetics at
the serving-typical 64², plus a mild-noise variant) buys agreement on
LR-style held-out inputs, with the shipped weights.

Also reports each calibration's agreement with bias correction, since
serving now applies it (ops/quant.py bias_correct=True).

Usage: python benchmarks/srgan_calib_probe.py [--cpu]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def _lr_batch(seed: int, n: int, hw: int, sigma: float = 0.0):
    from celebrity_image_denoiser_tpu.data.synthetic import lr_batch

    return lr_batch(seed, n, hw, sigma)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops import quant
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir=os.path.join(_REPO, "weights"))
    model = st.models["srgan"]
    params, state = st.params["srgan"]

    # held-out probe: LR images from disjoint seeds, one clean + one mild σ
    probe = jnp.concatenate([_lr_batch(900, 4, 48), _lr_batch(910, 4, 48,
                                                              sigma=0.03)])
    yf = jnp.asarray(model.apply(params, state, probe, train=False)[0],
                     jnp.float32)

    def agree(qapply):
        yq = jnp.asarray(qapply(probe), jnp.float32)
        mse = float(jnp.mean((yq - yf) ** 2))
        return 10.0 * math.log10(4.0 / max(mse, 1e-12))

    candidates = {
        "current (128² noisy σ=0.12)": calibration_batch(True),
        "LR clean 64²": _lr_batch(0, 16, 64),
        "LR clean+mild-noise 64²": jnp.concatenate(
            [_lr_batch(0, 8, 64), _lr_batch(20, 8, 64, sigma=0.05)]),
        "LR + current mix": jnp.concatenate(
            [_lr_batch(0, 8, 64),
             calibration_batch(True)[:8, :64, :64, :]]),
        "SHIPPED (srgan_calibration_batch)": None,
    }
    from celebrity_image_denoiser_tpu.data.synthetic import (
        srgan_calibration_batch,
    )

    for name, calib in candidates.items():
        if calib is None:
            calib = srgan_calibration_batch()
        a0 = agree(quant.quantize_apply(model, params, state, calib))
        a1 = agree(quant.quantize_apply(model, params, state, calib,
                                        bias_correct=True))
        print(f"{name:28s}  int8 {a0:6.2f} dB   +bc {a1:6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
