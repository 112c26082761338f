"""Agreement receipts for sequential bias-corrected PTQ (ops/quant.py
``bias_correct=True``).

For each served family, builds the generic int8 forward from the SHIPPED
weights with and without bias correction and reports agreement (dB, in
the family's serving range) against the float forward on a held-out
synthetic noisy batch (same generator as the serving calibration recipe
but a different seed/size, so the receipt isn't measured on the exact
calibration pixels).

Runs fine on CPU (rounding is deterministic; agreement is platform-
portable) — the TPU is only needed for throughput numbers, and bias
correction adds zero serving-time work (the constants fold into the
bias add).

Usage: python benchmarks/bias_correct_probe.py [--families ...]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="denoise,dncnn,esrgan,srgan,cgan")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops import quant
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir=os.path.join(_REPO, "weights"))
    print(f"device: {jax.devices()[0]}", flush=True)

    for fam in args.families.split(","):
        fam = fam.strip()
        if fam == "cgan":
            if st.keras_cgan is None:
                print(f"{fam}: keras weights not loaded, skipping")
                continue
            model, params, state = st.keras_cgan
            tanh = True
        else:
            model = st.models[fam]
            params, state = st.params[fam]
            tanh = fam in ("denoise", "srgan")
        sigmas = (0.05, 0.12, 0.25) if fam == "esrgan" else (0.12,)
        calib = calibration_batch(tanh, sigmas=sigmas)
        from celebrity_image_denoiser_tpu.data.synthetic import (
            heldout_noisy_batch,
        )

        probe = heldout_noisy_batch(tanh)

        yf = jnp.asarray(model.apply(params, state, probe, train=False)[0],
                         jnp.float32)
        rng = 2.0 if tanh else 1.0

        def agree(qapply):
            yq = jnp.asarray(qapply(probe), jnp.float32)
            mse = float(jnp.mean((yq - yf) ** 2))
            return 10.0 * math.log10(rng ** 2 / max(mse, 1e-12))

        base = quant.quantize_apply(model, params, state, calib)
        bc = quant.quantize_apply(model, params, state, calib,
                                  bias_correct=True)
        a0, a1 = agree(base), agree(bc)
        print(f"{fam:8s}  int8 {a0:6.2f} dB   +bias-correct {a1:6.2f} dB   "
              f"delta {a1 - a0:+.2f}", flush=True)


if __name__ == "__main__":
    main()
