"""XLA cost-analysis receipts for the headline serve step (no timing runs).

Compares the compiled bf16 and int8 denoise serving programs' FLOPs and
bytes-accessed as XLA reports them (`compiled.cost_analysis()`), plus the
arithmetic intensity each implies against the v5e roofline (197 bf16 /
394 int8 TOPS peak, 819 GB/s HBM).  Motivation: after two rejected Pallas
fusion receipts (benchmarks/kernel_notes.md), the remaining headline
headroom question is whether the int8 program's memory traffic is what it
should be — e.g. whether the i32 conv outputs or the skipped float
first/last layers dominate bytes.

Usage: python benchmarks/cost_analysis.py [--batch 2048] [--quant-first]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


def analyze(step, args, label):
    lowered = jax.jit(step).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    out = {
        "label": label,
        "gflops": round(flops / 1e9, 1),
        "gbytes": round(bytes_acc / 1e9, 2),
        "arith_intensity": round(flops / max(bytes_acc, 1.0), 1),
    }
    # roofline-implied ceilings at v5e numbers
    out["bw_bound_ms"] = round(bytes_acc / 819e9 * 1e3, 1)
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            out[k] = round(ca[k] / 1e9, 2)
    print(out)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--quant-first", action="store_true",
                    help="also analyze a policy that quantizes the 3-channel "
                         "image-side convs (normally skipped)")
    args = ap.parse_args()

    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core import prng
    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops import quant

    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    qapply = quant.quantize_apply(model, params, state,
                                  calibration_batch(tanh=True))

    def step_bf16(params, state, x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y, _ = model.apply(params, state, x, train=False)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    def step_i8(params, state, x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y = qapply(x)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    x = jnp.zeros((args.batch, 128, 128, 3), jnp.uint8)
    b = analyze(step_bf16, (bf16_params, state, x), "bf16")
    i = analyze(step_i8, (bf16_params, state, x), "int8")
    print({"int8_vs_bf16_bytes": round(i["gbytes"] / b["gbytes"], 3),
           "int8_vs_bf16_flops": round(i["gflops"] / b["gflops"], 3)})

    if args.quant_first:
        def no_skip(kernel):
            return False
        qapply_all = quant.quantize_apply(model, params, state,
                                          calibration_batch(tanh=True),
                                          skip=no_skip)

        def step_i8_all(params, state, x_uint8):
            x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
            y = qapply_all(x)
            y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
            return jnp.round(y01 * 255.0).astype(jnp.uint8)

        analyze(step_i8_all, (bf16_params, state, x), "int8-all-convs")


if __name__ == "__main__":
    main()
