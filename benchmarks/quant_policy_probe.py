"""On-chip probe: int8 skip-policy variants for the headline denoise step.

Receipts for whether widening the quantization policy (quantizing the
3-channel image-side convs that `ops.quant.default_skip_policy` skips)
buys throughput at the headline shape, and what it costs in bf16
agreement.  HLO analysis (benchmarks/hlo_traffic.py) shows XLA fuses the
requant into conv outputs, so quantizing the last 64->3 conv lets its
64-wide @128^2 input materialize as s8 instead of bf16 (-4.3 GB/step of
the ~70 GB total).

Methodology per benchmarks/kernel_notes.md: device-resident input, chained
iterations, scalar-fetch fence (block_until_ready over the tunnel is not a
barrier).

Usage: python benchmarks/quant_policy_probe.py [--batch 2048] [--iters 12]
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
    args = ap.parse_args()

    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core import compile_cache, prng
    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops import quant

    compile_cache.enable()
    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    calib = calibration_batch(tanh=True)

    policies = {
        "default": quant.default_skip_policy,
        # quantize everything, including the 3-channel image-side convs
        "no-skip": lambda kernel: False,
        # quantize the last conv's producer side only: skip convs whose
        # C_in<8 (the 3->64 first conv keeps float inputs; 64->3 runs int8
        # so its 64-wide input stores s8)
        "skip-cin-only": lambda kernel: int(kernel.shape[-2]) < 8,
    }

    def make_step(qapply):
        @jax.jit
        def step(params, state, x_uint8):
            x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
            y = qapply(x)
            y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
            return jnp.round(y01 * 255.0).astype(jnp.uint8)
        return step

    @jax.jit
    def step_bf16(params, state, x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y, _ = model.apply(params, state, x, train=False)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(
        0, 256, size=(args.batch, 128, 128, 3), dtype=np.uint8))
    probe = x[:8]

    def fence(y):
        np.asarray(jax.device_get(y[0, 0, 0, 0]))

    def measure(step):
        fence(step(bf16_params, state, x))
        t0 = time.perf_counter()
        cur = x
        for _ in range(args.iters):
            cur = step(bf16_params, state, cur)
        fence(cur)
        return args.iters * args.batch / (time.perf_counter() - t0)

    yb = np.asarray(jax.device_get(step_bf16(bf16_params, state, probe)),
                    np.float32)
    rate_bf16 = measure(step_bf16)
    print(f"bf16               : {rate_bf16:9.0f} imgs/s")

    for name, skip in policies.items():
        qapply = quant.quantize_apply(model, params, state, calib, skip=skip)
        step = make_step(qapply)
        yi = np.asarray(jax.device_get(step(bf16_params, state, probe)),
                        np.float32)
        mse = float(np.mean((yb - yi) ** 2))
        agree_db = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        rate = measure(step)
        print(f"int8 {name:<14}: {rate:9.0f} imgs/s  "
              f"agree {agree_db:5.1f} dB  ({rate / rate_bf16:.3f}x bf16)")


if __name__ == "__main__":
    main()
