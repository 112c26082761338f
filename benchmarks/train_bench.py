"""Training-step throughput at the reference configs, on the TPU.

One jitted GAN step per family (train/gan_trainer.make_train_step) with
on-device synthetic data + noise; ``--chunk`` steps chained in a lax.scan so
the tunnel's per-call dispatch doesn't pollute the number (same methodology
as bench.py / kernel_notes.md).  Reference configs (BASELINE.md):
denoise 256² b16 · srgan LR64→HR256 b8 · esrgan 256² b8 · cgan 256² b8 ·
dncnn 256² b16 (BASELINE config 3).

    python benchmarks/train_bench.py [--family denoise] [--steps 60]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "celebrity_image_denoiser_tpu")):
    sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from celebrity_image_denoiser_tpu.core import prng  # noqa: E402
from celebrity_image_denoiser_tpu.core.config import FAMILY_NOISE_VARIANT  # noqa: E402
from celebrity_image_denoiser_tpu.data.synthetic import synth_clean_batch  # noqa: E402
from celebrity_image_denoiser_tpu.train.gan_trainer import make_train_step  # noqa: E402

# v5e MXU peak (bf16); MFU is reported against this for both dtypes so the
# numbers compare directly with kernel_notes.md's serving figure (66%)
V5E_BF16_PEAK_TFLOPS = 197.0

# family -> (batch, size)  — the reference training configs
CONFIGS = {
    "denoise": (16, 256),
    "srgan": (8, 256),
    "esrgan": (8, 256),
    "cgan": (8, 256),   # the Keras arch — the one the reference trains
    "dncnn": (16, 256),
}


V5E_HBM_GBPS = 819.0  # same roofline constant as benchmarks/cost_analysis.py


def build_train_step(family: str, compute_dtype: str = "float32",
                     batch: int = None, size: int = None,
                     remat: bool = False):
    """(init_fn, step_fn, batch, size) for one family's jitted GAN step —
    the single construction site shared by the timing bench below and
    hlo_traffic.py's per-op attribution, so the 'exact program
    train_bench times' claim can't drift between the two tools."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from train_serving_weights import build_models, load_perceptual

    cfg_batch, cfg_size = CONFIGS[family]
    batch = batch or cfg_batch
    size = size or cfg_size
    if family == "cgan":
        from celebrity_image_denoiser_tpu import models as M

        gen = M.CGANKerasGenerator()
        disc = M.CGANKerasDiscriminator(input_hw=(size, size))
    else:
        gen, disc = build_models(family, size)
    init_fn, step_fn = make_train_step(
        gen, disc, family=family,
        perceptual=load_perceptual(None) if family == "srgan" else None,
        on_the_fly_noise=True,
        noise_variant=FAMILY_NOISE_VARIANT.get(family, 1),
        donate=False,
        sr_scale=4 if family == "srgan" else 1,
        compute_dtype=compute_dtype,
        remat=remat,
    )
    return init_fn, step_fn, batch, size


def bench_family(family: str, steps: int, chunk: int,
                 compute_dtype: str = "float32", batch: int = None,
                 no_metrics: bool = False, size: int = None,
                 remat: bool = False):
    init_fn, step_fn, batch, size = build_train_step(
        family, compute_dtype, batch=batch, size=size, remat=remat)

    def run_chunk(carry, key, lr):
        def body(c, k):
            kd, kn = jax.random.split(k)
            clean = synth_clean_batch(kd, batch, size) * 2.0 - 1.0
            c, m = step_fn(c, clean, clean, kn, lr, lr)
            # keep the metric outputs LIVE: real training consumes
            # psnr/ssim into history every step (GANTrainer), and a dead
            # output is DCE'd by XLA — timing without them flatters the
            # number (r5 receipt: the in-step metrics are ~12% of program
            # bytes and ~0 FLOPs).  --no-metrics drops them from the dict,
            # so the flag measures the real metric cost.
            return c, {k2: m[k2] for k2 in ("g_loss", "psnr", "ssim")
                       if k2 in m}

        return jax.lax.scan(body, carry, jax.random.split(key, chunk))

    if no_metrics:
        # isolate the in-step PSNR/SSIM cost: identical step minus metrics
        # (the reference computes them per batch; ours are on-device but
        # still inside the program — this quantifies their share).  Applied
        # BEFORE the roofline lowering below so the bytes receipt describes
        # the same metrics-free program the timing loop runs (XLA DCEs the
        # dropped psnr/ssim either way).
        raw_step = step_fn

        @jax.jit
        def step_fn(c, noisy, clean, k, lg, ld):  # noqa: F811
            c, m = raw_step(c, noisy, clean, k, lg, ld)
            return c, {"g_loss": m["g_loss"]}

    # ---- bytes-roofline receipt for the TRAIN PROGRAM proper -------------
    # the jitted step (noise synth + G/D fwd+bwd + Adam + in-step metrics;
    # the lax.scan data synth stays outside): GB/step + arithmetic
    # intensity + bandwidth/MXU floors, the serving cost_analysis.py table
    # applied to training (VERDICT r4 next #3).  Computed on the standalone
    # step program so the scan's once-per-body accounting can't distort the
    # bytes side.
    roofline = {}
    try:
        carry0 = init_fn(prng.key(8))
        clean0 = synth_clean_batch(prng.key(9), batch, size) * 2.0 - 1.0
        lowered = step_fn.lower(carry0, clean0, clean0, prng.key(10),
                                jnp.float32(1e-4), jnp.float32(1e-4))
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        s_flops = float(ca.get("flops", 0.0))
        s_bytes = float(ca.get("bytes accessed", 0.0))
        if s_bytes > 0:
            bw_floor_ms = s_bytes / (V5E_HBM_GBPS * 1e9) * 1e3
            mxu_floor_ms = s_flops / (V5E_BF16_PEAK_TFLOPS * 1e12) * 1e3
            roofline = {
                "gb_per_step": round(s_bytes / 1e9, 2),
                "arith_intensity": round(s_flops / s_bytes, 1),
                "bw_floor_ms": round(bw_floor_ms, 2),
                "mxu_floor_ms": round(mxu_floor_ms, 2),
                "bound": ("bandwidth" if bw_floor_ms > mxu_floor_ms
                          else "compute"),
            }
        del carry0
    except Exception as e:
        roofline = {"roofline_error": str(e)}

    run_chunk = jax.jit(run_chunk, donate_argnums=(0,))
    carry = init_fn(prng.key(0))
    lr = jnp.float32(1e-4)
    # compiled-HLO FLOP count (XLA cost analysis) -> honest MFU: measured
    # FLOP/s over the whole step program (data synth + noise + fwd + bwd +
    # optimizer + metrics) divided by the v5e bf16 MXU peak.  XLA's cost
    # analysis counts a while-loop body ONCE regardless of trip count
    # (verified: reported flops are chunk-invariant), so the chunk program's
    # flops ARE per-step — no /chunk.
    flops_per_step = None
    try:
        compiled = run_chunk.lower(carry, prng.key(1), lr).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_step = float(ca["flops"])
    except Exception:
        pass
    carry, losses = run_chunk(carry, prng.key(1), lr)  # compile + warm
    jax.device_get(jax.tree.map(lambda v: v[-1], losses))
    n_chunks = max(1, steps // chunk)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        carry, losses = run_chunk(carry, prng.key(2 + i), lr)
    # fence on EVERY live output (scalar fetch through the tunnel;
    # device_get blocks until the values are on host)
    jax.device_get(jax.tree.map(lambda v: v[-1], losses))
    dt = time.perf_counter() - t0
    total = n_chunks * chunk
    out = {"family": family, "batch": batch, "size": size,
           "steps_per_sec": round(total / dt, 2),
           "imgs_per_sec": round(total * batch / dt, 1),
           "ms_per_step": round(dt / total * 1e3, 2)}
    if flops_per_step:
        tflops = flops_per_step * total / dt / 1e12
        out["hlo_gflop_per_step"] = round(flops_per_step / 1e9, 1)
        out["tflops"] = round(tflops, 1)
        out["mfu_vs_bf16_peak"] = round(tflops / V5E_BF16_PEAK_TFLOPS, 3)
    out.update(roofline)
    if "bw_floor_ms" in roofline:
        floor = max(roofline["bw_floor_ms"], roofline["mxu_floor_ms"])
        out["measured_vs_floor"] = round(out["ms_per_step"] / floor, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None, choices=list(CONFIGS))
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=None,
                    help="override the reference batch size (scaling probes)")
    ap.add_argument("--size", type=int, default=None,
                    help="override the reference image size (TPU-sized rows)")
    ap.add_argument("--no-metrics", action="store_true",
                    help="drop in-step PSNR/SSIM (quantifies their share)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the G forward: recompute "
                         "activations in the bwd pass instead of storing + "
                         "re-reading them — a bytes capture when the step "
                         "is bandwidth-bound (all five are at the reference "
                         "configs; see kernel_notes.md r5)")
    args = ap.parse_args()
    fams = [args.family] if args.family else list(CONFIGS)
    for f in fams:
        r = bench_family(f, args.steps, args.chunk, args.compute_dtype,
                         batch=args.batch, no_metrics=args.no_metrics,
                         size=args.size, remat=args.remat)
        if args.remat:
            r["remat"] = True
        r["compute_dtype"] = args.compute_dtype
        if args.no_metrics:
            r["no_metrics"] = True
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
