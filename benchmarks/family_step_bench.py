"""Per-family serving-step throughput receipts on the real chip.

The headline bench (bench.py) receipts only the flagship denoise family.
This probe measures the OTHER served families through the exact program
``ServeState`` serves — including each family's int8 routing (s8
skip-storage for denoise, the generic conv-hook transform elsewhere,
float fallback where calibration refuses) — so "every hot kernel
optimized" has a per-family number behind it instead of an extrapolation.

Per family the measured step is u8 → normalize → forward → u8, jitted as
one program on device-resident input (the chip metric; the ~25 MB/s dev
tunnel would otherwise measure the network).  Methodology per
benchmarks/kernel_notes.md: chained iterations (each step consumes the
previous output; srgan's ×4 output is stride-sliced back to input size by
a jitted shrink so the chain stays on device) and a scalar-fetch fence —
``block_until_ready`` alone is not a completion barrier on this backend.

Usage:
    python benchmarks/family_step_bench.py [--families dncnn,esrgan]
        [--quantize int8|none] [--batch N] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

# (batch, input_hw) per family: batch ≈ throughput saturation at safe HBM
# (denoise receipted at 2048 in bench.py; the full-res chains and the ×4
# upscaler carry bigger activations per image, hence smaller batches)
DEFAULTS = {
    "denoise": (2048, 128),
    "dncnn": (1024, 128),
    "esrgan": (512, 128),
    "srgan": (512, 64),
    "cgan:keras": (1024, 128),
}
TANH = {"denoise": True, "srgan": True, "cgan:keras": True,
        "dncnn": False, "esrgan": False}


def build_step(st, which: str):
    """One u8→u8 jitted program: the family's served forward (int8 routing
    and all) with the normalize fused on device."""
    base = which.split(":")[0]
    if which == "cgan:keras":
        if st.keras_cgan is None:
            raise RuntimeError("keras cgan weights not loaded")
        model, params, state = st.keras_cgan
    else:
        model = st.models[base]
        params, state = st.params[base]
    tanh = TANH[which]
    # probe through _forward once so ServeState builds + memoizes the raw
    # fn and the qapply exactly as serving would
    probe = jnp.zeros((1, 32, 32, 3), jnp.bfloat16)
    st._forward(which, model, params, state, probe)
    raw = st._fns[("raw", which)]
    quantized = st._fns.get(("qapply", which)) is not None

    @jax.jit
    def step(x_u8):
        x = x_u8.astype(jnp.bfloat16) * ((2.0 if tanh else 1.0) / 255.0)
        if tanh:
            x = x - 1.0
        return raw(params, state, x)

    return step, ("int8" if quantized else "float")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(DEFAULTS))
    ap.add_argument("--quantize", default="int8", choices=["int8", "none"])
    ap.add_argument("--batch", type=int, default=None,
                    help="override the per-family default batch")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from celebrity_image_denoiser_tpu.core import compile_cache
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    compile_cache.enable()
    st = ServeState(weights_dir=os.path.join(_REPO, "weights"),
                    quantize=None if args.quantize == "none" else "int8")
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    shrink4 = jax.jit(lambda y: y[:, ::4, ::4, :])  # srgan chain closure

    for which in args.families.split(","):
        which = which.strip()
        if which == "cgan":  # natural spelling of the served keras backend
            which = "cgan:keras"
        try:
            b, hw = DEFAULTS[which]  # inside try: one unknown family must
            if args.batch:           # not abort the other measurements
                b = args.batch
            step, path = build_step(st, which)
            rng = np.random.default_rng(0)
            x = jax.device_put(rng.integers(
                0, 256, (b, hw, hw, 3), dtype=np.uint8), dev)
            t_c0 = time.perf_counter()
            y = step(x)
            np.asarray(jax.device_get(y[0, 0, 0, 0]))  # compile fence
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = step(x)
                x = shrink4(y) if which == "srgan" else y
            np.asarray(jax.device_get(x[0, 0, 0, 0]))  # scalar fence
            dt = time.perf_counter() - t0
            print(json.dumps({
                "family": which, "path": path, "batch": b, "hw": hw,
                "imgs_per_s": round(b * args.iters / dt, 1),
                "ms_per_step": round(1e3 * dt / args.iters, 2),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"family": which, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
