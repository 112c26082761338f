"""ESRGAN trunk-s8 storage: agreement feasibility probe.

The generic int8 transform leaves ESRGAN's residual-trunk tensors in bf16
because each block input has two consumers — the block's first conv
(wants s8) and the additive identity skip (wants the exact value).
Storing the trunk s8 (at the consuming conv's calibrated per-channel
scales, like the U-Net skip storage in ops/quant_unet.py) would cut the
dominant trunk traffic ~35-40%%, BUT unlike the U-Net concat skips the
dequantized value re-enters the *identity* path, so each of the 9 stored
tensors adds rounding error directly to the output.  ESRGAN's agreement
gate is the tightest of the five families (~40 dB runtime bar), so this
probe measures agreement FIRST, on CPU, before any chip time is spent:

* ``generic``   — ops/quant.py baseline (trunk bf16)
* ``x1-s8``     — only the long-lived head output stored s8 (one extra
                  rounding on the global-skip path; frees the one buffer
                  that lives across all 8 blocks)
* ``trunk-s8``  — every block input stored s8 (maximum byte cut, 9
                  rounding injections on the identity path)

against the bf16 float forward on a held-out synthetic batch, with the
shipped weights.  Throughput receipts only matter if a variant clears
the 40 dB bar with margin.

Usage: python benchmarks/esrgan_s8_probe.py [--cpu]
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
from jax import lax

from celebrity_image_denoiser_tpu.ops import quant
from celebrity_image_denoiser_tpu.ops.quant_unet import _conv_q, _q

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_f(x, w, bias, pad):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN, preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + bias.astype(x.dtype)


def _prelu(x, alpha):
    a = jnp.asarray(alpha, x.dtype)
    return jnp.where(x >= 0, x, a * x)


def _bn_eval(x, bn_p, bn_s, eps=1e-5):
    scale = jnp.asarray(bn_p["scale"], jnp.float32)
    bias = jnp.asarray(bn_p["bias"], jnp.float32)
    mean = jnp.asarray(bn_s["mean"], jnp.float32)
    var = jnp.asarray(bn_s["var"], jnp.float32)
    mul = scale / jnp.sqrt(var + eps)
    return (x.astype(jnp.float32) * mul + (bias - mean * mul)).astype(x.dtype)


def build(model, params, state, calib_x, *, trunk_s8: bool, x1_s8: bool):
    """Structured s8-storage forward for ESRGANGenerator(num_residuals=8).

    Taps: [0] head 9×9 3→64 (float), [1+2b, 2+2b] block b convs (int8),
    [17] tail 9×9 64→3 (float) — same skip policy as the generic transform.
    """
    tap = quant._Calibrate()
    with quant._mode(tap):
        model.apply(params, state, calib_x, train=False)
    if len(tap.taps) != 18:
        raise ValueError(f"expected 18 conv taps, got {len(tap.taps)}")

    def scale_of(i):
        amax_c = jnp.asarray(tap.taps[i][0], jnp.float32)
        return jnp.maximum(jnp.maximum(amax_c, 0.01 * jnp.max(amax_c)),
                           1e-12) / 127.0

    s = [scale_of(i) for i in range(18)]
    W = {}
    for i in range(1, 17):
        kernel = tap.taps[i][1]
        w_folded = jnp.asarray(kernel, jnp.float32) * s[i].reshape(1, 1, -1, 1)
        W[i] = quant.quantize_weight(w_folded)

    p, st = params, state
    blocks = [p["residuals"][str(b)]["block"] for b in range(8)]
    bstates = [st["residuals"][str(b)]["block"] for b in range(8)]
    W0 = jnp.asarray(p["initial"]["0"]["kernel"], jnp.bfloat16)
    b0 = jnp.asarray(p["initial"]["0"]["bias"], jnp.bfloat16)
    a0 = p["initial"]["1"]["alpha"]
    W17 = jnp.asarray(p["final"]["kernel"], jnp.bfloat16)
    b17 = jnp.asarray(p["final"]["bias"], jnp.bfloat16)

    def forward(x):
        in_dtype = x.dtype
        x = x.astype(jnp.bfloat16)
        x1 = _prelu(_conv_f(x, W0, b0, pad=4), a0)
        x1_store = _q(x1, s[1]) if x1_s8 else x1
        t_q = _q(x1, s[1]) if not x1_s8 else x1_store  # block-1 conv input
        t_f = None if (trunk_s8 or x1_s8) else x1      # exact trunk value
        for b in range(8):
            i1, i2 = 1 + 2 * b, 2 + 2 * b
            bp, bs = blocks[b], bstates[b]
            bias1 = jnp.asarray(bp["0"]["bias"], jnp.bfloat16)
            bias2 = jnp.asarray(bp["3"]["bias"], jnp.bfloat16)
            h = _conv_q(t_q, *W[i1], bias1)
            h = _prelu(_bn_eval(h, bp["1"], bs["1"]), bp["2"]["alpha"])
            y = _conv_q(_q(h, s[i2]), *W[i2], bias2)
            y = _bn_eval(y, bp["4"], bs["4"])
            # identity path: dequantized trunk under trunk_s8, exact bf16
            # otherwise (x1_s8 only affects the copy kept for the final add)
            base = (t_q.astype(jnp.float32) * s[i1]).astype(jnp.bfloat16) \
                if trunk_s8 else (t_f if t_f is not None else
                                  (t_q.astype(jnp.float32) * s[i1]).astype(
                                      jnp.bfloat16))
            t_next = base + y
            if b < 7:
                t_q = _q(t_next, s[1 + 2 * (b + 1)])
                if not trunk_s8:
                    t_f = t_next
        x1_add = (x1_store.astype(jnp.float32) * s[1]).astype(jnp.bfloat16) \
            if x1_s8 else x1
        out = _conv_f(x1_add + t_next, W17, b17, pad=4)
        return out.astype(in_dtype)

    return forward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from celebrity_image_denoiser_tpu.data.synthetic import (
        calibration_batch, heldout_noisy_batch,
    )
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir=os.path.join(_REPO, "weights"))
    model = st.models["esrgan"]
    params, state = st.params["esrgan"]
    calib = calibration_batch(False, sigmas=(0.05, 0.12, 0.25))

    probe = heldout_noisy_batch(False)

    yf = jnp.asarray(model.apply(params, state, probe, train=False)[0],
                     jnp.float32)

    def agree(fn):
        yq = jnp.asarray(fn(probe), jnp.float32)
        mse = float(jnp.mean((yq - yf) ** 2))
        return 10.0 * math.log10(1.0 / max(mse, 1e-12))

    generic = quant.quantize_apply(model, params, state, calib)
    variants = [
        ("generic (trunk bf16)", generic),
        ("structured bf16-trunk (sanity vs generic)",
         build(model, params, state, calib, trunk_s8=False, x1_s8=False)),
        ("x1-s8 only",
         build(model, params, state, calib, trunk_s8=False, x1_s8=True)),
        ("trunk-s8",
         build(model, params, state, calib, trunk_s8=True, x1_s8=True)),
    ]
    for name, fn in variants:
        print(f"{name:44s} {agree(fn):6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
