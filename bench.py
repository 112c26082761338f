"""Benchmark: 128×128 face denoises/sec/chip (BASELINE.json headline metric).

Measures the flagship denoise U-Net serving step — uint8 → [-1,1] normalize →
U-Net forward → [0,1] denorm → uint8 — as one jitted program on
device-resident input batches.  Since round 3 the step runs an int8
post-training-quantized forward (v5e int8 MXU is 2× the bf16 rate) behind
an in-run agreement gate; since round 4 it is the s8 *skip-storage*
specialization (ops/quant_unet.py — skips stored s8 at the concat
consumer's scales, 70.3→37.9 GB/step of HBM traffic), with the generic
transform (ops/quant.py) as the next rung and bf16 last: any rung that
disagrees with the bf16 step by more than the serving quality bar (40 dB
on u8 pixels) is refused.  The shipped-weights quality gate lives in
tests/test_quant.py::test_quantized_serving_quality_gate.

Methodology notes (benchmarks/kernel_notes.md):
* Iterations are **chained** (each step consumes the previous step's output)
  so no caching/dedup can elide work, and the run ends with a **scalar-fetch
  fence** — on tunneled PJRT backends ``block_until_ready`` alone is not a
  reliable completion barrier and over-reports by ~60×.
* Inputs are staged on device before timing: this is the per-chip compute
  metric. (This dev environment attaches the chip through a ~25 MB/s network
  tunnel; a fresh-pixels pipeline would be tunnel-bound at ~500 imgs/s, which
  measures the tunnel, not the chip. Production hosts feed via PCIe/DMA at
  GB/s — see the double-buffered pipeline in data/pipeline.py.)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline is against the 10k imgs/sec/chip north-star target.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 10_000.0  # north star: ≥10k 128² denoises/sec/chip
BATCH = 2048  # throughput saturates ~here (benchmarks/kernel_notes.md)
N_ITERS = 12
WATCHDOG_S = 900  # the tunneled worker can wedge (never-returning fetches);
                  # emit a diagnostic line and exit instead of hanging the
                  # driver.  900 s: the bench compiles four programs (bf16 +
                  # int8, probe + full batch) and remote compiles have been
                  # observed taking minutes each on a degraded worker.


def _arm_watchdog():
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": "128x128_denoises_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec (TPU worker unresponsive — watchdog fired; "
                    "last good compute measurement: ~19,800 imgs/s int8 "
                    "s8-skip / 14,1xx int8 generic / 11,7xx bf16, see "
                    "benchmarks/kernel_notes.md)",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(2)

    t = threading.Timer(WATCHDOG_S, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _arm_watchdog()
    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core import compile_cache, prng
    from celebrity_image_denoiser_tpu.ops import quant

    compile_cache.enable()  # repeat driver runs skip the four XLA compiles

    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    # pre-cast the serving weights once (f32 master stays for training);
    # saves the per-step f32→bf16 weight conversion and HBM reads
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # int8 post-training-quantized forward (ops/quant.py; +20% measured,
    # kernel_notes.md round 3) — gated below: if it disagrees with the
    # float path by more than the serving quality gate allows, the bench
    # falls back to the bf16 step and says so in the unit string.
    # Calibration uses the SAME recipe as serve/handlers._maybe_quantize
    # (data.synthetic.calibration_batch: 8 synthetic noisy images at the
    # serving-typical σ, tanh domain — the exact recipe handlers passes for
    # the denoise family; only esrgan gets the 3-σ spread) so the
    # benchmarked int8 program matches the served one (advisor r3 #4).
    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops.quant_unet import (
        quantize_apply_denoise_unet,
    )

    # s8 skip-storage specialization (ops/quant_unet.py): skips stored s8 at
    # the concat consumer's scales → 70.3→37.9 GB/step, 14.1k→19.8k imgs/s
    # (kernel_notes.md round 4).  If its in-run agreement gate fails — or a
    # builder raises (e.g. a model topology edit trips the 12-conv check) —
    # the generic transform is the next rung, then bf16; a rung failure must
    # never crash the bench before its one-JSON-line contract.
    calib = calibration_batch(tanh=True)
    try:
        qapply = quantize_apply_denoise_unet(model, params, state, calib)
    except Exception:
        qapply = None
    try:
        # bias_correct matches serving's generic rung (handlers builds the
        # fallback transform the same way — advisor r3 #4's program parity)
        qapply_generic = quant.quantize_apply(model, params, state, calib,
                                              bias_correct=True)
    except Exception:
        qapply_generic = None

    @jax.jit
    def serve_step_bf16(params, state, x_uint8):
        # full serving compute: uint8 → [-1,1] → U-Net → [0,1] → uint8
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y, _ = model.apply(params, state, x, train=False)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    @jax.jit
    def serve_step_i8(params, state, x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y = qapply(x)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    @jax.jit
    def serve_step_i8_generic(params, state, x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y = qapply_generic(x)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 256, size=(BATCH, 128, 128, 3), dtype=np.uint8))

    def fence(y):
        np.asarray(jax.device_get(y[0, 0, 0, 0]))

    # quality gate: the int8 step must agree with the bf16 step on real
    # pixels (>=40 dB in the u8 domain, the serving gate's bar) or the
    # bench refuses to count it
    probe = x[:8]
    yb = np.asarray(jax.device_get(serve_step_bf16(bf16_params, state, probe)),
                    dtype=np.float32)

    def agreement(step):
        yi = np.asarray(jax.device_get(step(bf16_params, state, probe)),
                        dtype=np.float32)
        mse = float(np.mean((yb - yi) ** 2))
        return 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))

    def try_agreement(step):
        try:
            return agreement(step)
        except Exception:
            return -1.0  # a rung that can't even run fails its gate

    def measure(step):
        fence(step(bf16_params, state, x))  # warmup/compile
        t0 = time.perf_counter()
        cur = x
        for _ in range(N_ITERS):
            cur = step(bf16_params, state, cur)  # chained: no elision
        fence(cur)
        return N_ITERS * BATCH / (time.perf_counter() - t0)

    # measure bf16 always; walk the int8 rungs in order and keep the first
    # that BOTH passes the agreement gate and measures (the b2048 compile
    # is a different program than the b8 agreement probe — a degraded
    # worker can fail it, and a rung failure must never crash the bench
    # before its one-JSON-line contract); report whichever path is faster
    rate_bf16 = measure(serve_step_bf16)
    i8_name, agree_db, rate_i8 = None, -1.0, 0.0
    skipped = []  # per-rung outcomes, so a fallback note never mis-blames
    for cand_step, cand_name, cand_q in (
            (serve_step_i8, "int8-s8skip", qapply),
            (serve_step_i8_generic, "int8-generic", qapply_generic)):
        if cand_q is None:
            skipped.append(f"{cand_name}: builder failed")
            continue
        db = try_agreement(cand_step)
        if db < 40.0:
            skipped.append(f"{cand_name}: gate FAILED {db:.0f} dB")
            continue
        try:
            rate = measure(cand_step)
        except Exception:
            skipped.append(f"{cand_name}: gate ok {db:.0f} dB but "
                           "b2048 measure failed")
            continue
        i8_name, agree_db, rate_i8 = cand_name, db, rate
        break
    if rate_i8 > rate_bf16:
        imgs_per_sec = rate_i8
        note = f"{i8_name} ({agree_db:.0f} dB vs bf16; bf16 {rate_bf16:.0f}/s)"
    elif i8_name is not None:
        imgs_per_sec = rate_bf16
        note = f"bf16 ({i8_name} slower: {rate_i8:.0f}/s)"
    else:
        imgs_per_sec = rate_bf16
        note = "bf16 (" + "; ".join(skipped or ["no int8 rung"]) + ")"

    watchdog.cancel()
    print(json.dumps({
        "metric": "128x128_denoises_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": f"images/sec [{note}]",
        "vs_baseline": round(imgs_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
