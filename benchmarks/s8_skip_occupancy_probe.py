"""Isolated serving-step probe: denoise float vs generic int8 vs s8-skip
at production occupancies (the micro-batcher coalesces 1-16 requests).

Companion to benchmarks/int8_crossover_probe.py (which settled the int8
default-on question for DnCNN): this one receipts whether the round-4 s8
skip-storage forward (ops/quant_unet.py) also wins at the SMALL batches
live serving actually runs, not just the b2048 headline.  Exactly
handlers._forward's program for the denoise family: u8 -> [-1,1] -> U-Net
-> [0,1] -> u8, shipped serving-identical calibration.

Methodology per kernel_notes.md: device-resident inputs, chained
iterations, scalar-fetch fence.

Usage: python benchmarks/s8_skip_occupancy_probe.py [--sizes 256,512]
         [--batches 1,4,16] [--iters 8]
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
    ap.add_argument("--sizes", default="256,512")
    ap.add_argument("--batches", default="1,4,16")
    ap.add_argument("--iters", type=int, default=8)
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
    calib = calibration_batch(tanh=True)
    qgen = quant.quantize_apply(model, params, state, calib)
    qskip = quantize_apply_denoise_unet(model, params, state, calib)

    def mk(apply):
        @jax.jit
        def step(x_u8):
            x = x_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
            y = apply(x)
            return (jnp.clip(y * 0.5 + 0.5, 0, 1) * 255).astype(jnp.uint8)
        return step

    step_f = mk(lambda x: model.apply(params, state, x, train=False)[0])
    step_g = mk(qgen)
    step_s = mk(qskip)

    def fence(y):
        np.asarray(jax.device_get(y[0, 0, 0, 0]))

    rng = np.random.default_rng(0)
    print(f"{'size':>5} {'batch':>5} {'float ms':>9} {'int8 ms':>9} "
          f"{'s8skip ms':>9}  speedups")
    for size in [int(s) for s in args.sizes.split(",")]:
        for bsz in [int(b) for b in args.batches.split(",")]:
            x = jax.device_put(rng.integers(
                0, 256, (bsz, size, size, 3), dtype=np.uint8))
            times = []
            for step in (step_f, step_g, step_s):
                fence(step(x))  # warmup/compile
                t0 = time.perf_counter()
                cur = x
                for _ in range(args.iters):
                    cur = step(cur)
                fence(cur)
                times.append((time.perf_counter() - t0) / args.iters * 1e3)
            f, g, s = times
            print(f"{size:>5} {bsz:>5} {f:9.2f} {g:9.2f} {s:9.2f}  "
                  f"int8 {f/g:.2f}x, s8skip {f/s:.2f}x "
                  f"(vs int8 {g/s:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
