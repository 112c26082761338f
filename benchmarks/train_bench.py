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

# family -> (batch, size)  — the reference training configs
CONFIGS = {
    "denoise": (16, 256),
    "srgan": (8, 256),
    "esrgan": (8, 256),
    "cgan": (8, 256),   # the Keras arch — the one the reference trains
    "dncnn": (16, 256),
}


def bench_family(family: str, steps: int, chunk: int,
                 compute_dtype: str = "float32"):
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    from train_serving_weights import build_models, load_perceptual

    batch, size = CONFIGS[family]
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
    )

    def run_chunk(carry, key, lr):
        def body(c, k):
            kd, kn = jax.random.split(k)
            clean = synth_clean_batch(kd, batch, size) * 2.0 - 1.0
            c, m = step_fn(c, clean, clean, kn, lr, lr)
            return c, m["g_loss"]

        return jax.lax.scan(body, carry, jax.random.split(key, chunk))

    run_chunk = jax.jit(run_chunk, donate_argnums=(0,))
    carry = init_fn(prng.key(0))
    lr = jnp.float32(1e-4)
    carry, losses = run_chunk(carry, prng.key(1), lr)  # compile + warm
    np.asarray(jax.device_get(losses[-1]))
    n_chunks = max(1, steps // chunk)
    t0 = time.perf_counter()
    for i in range(n_chunks):
        carry, losses = run_chunk(carry, prng.key(2 + i), lr)
    np.asarray(jax.device_get(losses[-1]))  # fence
    dt = time.perf_counter() - t0
    total = n_chunks * chunk
    return {"family": family, "batch": batch, "size": size,
            "steps_per_sec": round(total / dt, 2),
            "imgs_per_sec": round(total * batch / dt, 1),
            "ms_per_step": round(dt / total * 1e3, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None, choices=list(CONFIGS))
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=20)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    fams = [args.family] if args.family else list(CONFIGS)
    for f in fams:
        r = bench_family(f, args.steps, args.chunk, args.compute_dtype)
        r["compute_dtype"] = args.compute_dtype
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
