"""On-chip probe: int8 U-Net with s8 *skip storage* (headline experiment).

The round-4 traffic receipts (kernel_notes.md "Round 4") show the generic
int8 transform's residual bf16 HBM traffic is exactly the dual-consumer
U-Net skip tensors (e1/e2), the conv-transpose outputs feeding the
concats, and the float last conv's input.  This probe measures the
PRODUCTIZED s8 skip-storage builder (ops/quant_unet.py — the probe runs
the exact program serving and bench run, so re-running the receipt always
measures the shipped path) in both variants:

* ``s8skip+last`` — the serving default (``quant_last=True``);
* ``s8skip`` — the ablation keeping the 64→3 tail conv float.

against the generic transform and bf16.  On-chip results (b2048 128²):
bf16 11,753 / generic int8 14,094 / s8skip 19,382 / s8skip+last 19,798
imgs/s at 58.9-59.2 dB agreement.

Methodology per kernel_notes.md: device-resident input, chained
iterations, scalar-fetch fence.

Usage: python benchmarks/s8_skip_probe.py [--batch 2048] [--iters 12]
       [--cost-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--cost-only", action="store_true")
    args = ap.parse_args()

    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core import compile_cache, prng
    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops import quant
    from celebrity_image_denoiser_tpu.ops.quant_unet import (
        quantize_apply_denoise_unet,
    )

    compile_cache.enable()
    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    calib = calibration_batch(tanh=True)

    def mk(apply):
        @jax.jit
        def step(x_uint8):
            x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
            y = apply(x)
            return jnp.round(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255).astype(
                jnp.uint8)
        return step

    step_bf16 = mk(
        lambda x: model.apply(bf16_params, state, x, train=False)[0])
    variants = [
        ("int8-v0", mk(quant.quantize_apply(model, params, state, calib))),
        ("s8skip", mk(quantize_apply_denoise_unet(
            model, params, state, calib, quant_last=False))),
        ("s8skip+last", mk(quantize_apply_denoise_unet(
            model, params, state, calib))),
        ("s8skip+split", mk(quantize_apply_denoise_unet(
            model, params, state, calib, split_concat=True))),
    ]

    x_shape = (args.batch, 128, 128, 3)
    if args.cost_only:
        xz = jnp.zeros(x_shape, jnp.uint8)
        for name, fn in [("bf16", step_bf16)] + variants:
            ca = fn.lower(xz).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            print(f"{name:<12}: {ca.get('bytes accessed', 0)/1e9:6.2f} GB, "
                  f"{ca.get('flops', 0)/1e12:6.2f} TFLOP")
        return

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, size=x_shape, dtype=np.uint8))
    probe = x[:8]

    def fence(y):
        np.asarray(jax.device_get(y[0, 0, 0, 0]))

    def measure(fn):
        fence(fn(x))
        t0 = time.perf_counter()
        cur = x
        for _ in range(args.iters):
            cur = fn(cur)
        fence(cur)
        return args.iters * args.batch / (time.perf_counter() - t0)

    yb = np.asarray(jax.device_get(step_bf16(probe)), np.float32)
    print(f"bf16        : {measure(step_bf16):9.0f} imgs/s", flush=True)
    for name, fn in variants:
        yi = np.asarray(jax.device_get(fn(probe)), np.float32)
        mse = float(np.mean((yb - yi) ** 2))
        agree = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        print(f"{name:<12}: {measure(fn):9.0f} imgs/s  agree {agree:5.1f} dB",
              flush=True)


if __name__ == "__main__":
    main()
