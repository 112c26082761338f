"""On-chip probe: int8 U-Net with s8 *skip storage* (headline experiment).

The round-4 traffic receipts (kernel_notes.md "Round 4") show the generic
int8 transform's residual bf16 HBM traffic is exactly the dual-consumer
U-Net skip tensors (e1/e2), the conv-transpose outputs feeding the
concats, and the float last conv's input.  This probe implements the
13-conv denoise forward with explicit quantization placement:

* skips are STORED s8, quantized at the concat consumer's per-channel
  scales (s10[64:] for e1, s7[128:] for e2) — so the producing conv's
  epilogue writes s8 and bf16 never materializes;
* the pool path consumes the same s8 buffer (max-pool commutes with the
  positive per-channel scale and with round, so pooled s8 IS the pooled
  activation quantized at the same scale — zero extra rounding error);
  the following conv's weights are folded with the skip-storage scale
  instead of its own calibrated one (a strict superset of the pooled
  range, so only ≤1 bit of resolution is at stake);
* conv-transpose outputs quantize to their concat slice's scale in the
  epilogue, so the concat reads two s8 halves;
* optionally the 64→3 last conv runs int8 too, letting its 64-wide @128²
  input store s8.

Calibration scales/weight folds reuse ops/quant.py's exact recipe
(per-channel amax, 1% floor, fold-into-weight) via its calibration tap.

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
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def q(x, s):
    """Quantize bf16/f32 activations to s8 with per-channel scales s (f32[C])."""
    xi = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(xi, -127, 127).astype(jnp.int8)


def conv_q(x_s8, w_i8, w_scale, bias, *, padding=1):
    y = lax.conv_general_dilated(
        x_s8, w_i8, window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=DN, preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * w_scale).astype(jnp.bfloat16) + bias


def convt_q(x_s8, w_i8, w_scale, bias):
    # 2x2 stride-2 transpose conv as fractionally-strided conv (ops/conv.py)
    k2 = jnp.swapaxes(jnp.flip(w_i8, axis=(0, 1)), 2, 3)
    y = lax.conv_general_dilated(
        x_s8, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * w_scale).astype(jnp.bfloat16) + bias


def conv_f(x, w, bias, *, padding=1):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=DN, preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + bias.astype(x.dtype)


def maxpool_s8(x):
    return lax.reduce_window(x, jnp.int8(-128), lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def build(params, state, model, calib_x, *, quant_last: bool):
    """Calibrate with ops/quant.py's tap, then fold weights with the skip-
    storage scale substitutions and return the jittable s8-skip forward."""
    from celebrity_image_denoiser_tpu.ops import quant

    tap = quant._Calibrate()
    with quant._mode(tap):
        model.apply(params, state, calib_x, train=False)
    assert len(tap.taps) == 12, len(tap.taps)

    def scale_of(i):
        amax_c = jnp.asarray(tap.taps[i][0], jnp.float32)
        return jnp.maximum(jnp.maximum(amax_c, 0.01 * jnp.max(amax_c)),
                           1e-12) / 127.0

    s = [scale_of(i) for i in range(12)]
    # skip-storage scale substitutions (see module docstring)
    s_e1 = s[10][64:]   # e1 stored at upconv1.0's last-64 slice
    s_e2 = s[7][128:]   # e2 stored at upconv2.0's last-128 slice
    fold_scale = {1: s[1], 2: s_e1, 3: s[3], 4: s_e2, 5: s[5], 6: s[6],
                  7: s[7], 8: s[8], 9: s[9], 10: s[10]}
    if quant_last:
        fold_scale[11] = s[11]

    def fold(i, out_axis=-1):
        kernel, sc = tap.taps[i][1], fold_scale[i]
        oa = out_axis % kernel.ndim
        in_axis = 3 if oa == 2 else kernel.ndim - 2
        assert int(kernel.shape[in_axis]) == int(sc.shape[0])
        fold_shape = [1] * kernel.ndim
        fold_shape[in_axis] = -1
        w_folded = jnp.asarray(kernel, jnp.float32) * sc.reshape(fold_shape)
        return quant.quantize_weight(w_folded, out_axis)

    W = {i: fold(i) for i in (1, 2, 3, 4, 5, 7, 8, 10)}
    W[6] = fold(6, out_axis=2)
    W[9] = fold(9, out_axis=2)
    if quant_last:
        W[11] = fold(11)

    p = params
    b = {  # biases + float-path weights, bf16
        i: jnp.asarray(v, jnp.bfloat16) for i, v in {
            0: p["down1"]["0"]["bias"], 1: p["down1"]["2"]["bias"],
            2: p["down2"]["0"]["bias"], 3: p["down2"]["2"]["bias"],
            4: p["bottleneck"]["0"]["bias"], 5: p["bottleneck"]["2"]["bias"],
            6: p["up2"]["bias"], 7: p["upconv2"]["0"]["bias"],
            8: p["upconv2"]["2"]["bias"], 9: p["up1"]["bias"],
            10: p["upconv1"]["0"]["bias"], 11: p["upconv1"]["2"]["bias"],
        }.items()
    }
    W0 = jnp.asarray(p["down1"]["0"]["kernel"], jnp.bfloat16)
    W11 = jnp.asarray(p["upconv1"]["2"]["kernel"], jnp.bfloat16)
    relu = jax.nn.relu

    def forward(x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        h = relu(conv_f(x, W0, b[0]))
        h = q(h, s[1])                                   # epilogue -> s8
        e1_s8 = q(relu(conv_q(h, *W[1], b[1])), s_e1)    # e1 stored s8
        p1 = maxpool_s8(e1_s8)
        h = q(relu(conv_q(p1, *W[2], b[2])), s[3])
        e2_s8 = q(relu(conv_q(h, *W[3], b[3])), s_e2)    # e2 stored s8
        p2 = maxpool_s8(e2_s8)
        h = q(relu(conv_q(p2, *W[4], b[4])), s[5])
        bo = q(relu(conv_q(h, *W[5], b[5])), s[6])
        d2a = q(convt_q(bo, *W[6], b[6]), s[7][:128])    # convT -> s8 slice
        h = q(relu(conv_q(jnp.concatenate([d2a, e2_s8], -1), *W[7], b[7])),
              s[8])
        d2 = q(relu(conv_q(h, *W[8], b[8])), s[9])
        d1a = q(convt_q(d2, *W[9], b[9]), s[10][:64])
        h = relu(conv_q(jnp.concatenate([d1a, e1_s8], -1), *W[10], b[10]))
        if quant_last:
            y = conv_q(q(h, s[11]), *W[11], b[11])
        else:
            y = conv_f(h, W11, b[11])
        y = jnp.tanh(y)
        y01 = jnp.clip(y * 0.5 + 0.5, 0.0, 1.0)
        return jnp.round(y01 * 255.0).astype(jnp.uint8)

    return forward


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

    compile_cache.enable()
    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    calib = calibration_batch(tanh=True)

    qapply = quant.quantize_apply(model, params, state, calib)

    @jax.jit
    def step_v0(x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y = qapply(x)
        return jnp.round(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255).astype(jnp.uint8)

    @jax.jit
    def step_bf16(x_uint8):
        x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
        y, _ = model.apply(bf16_params, state, x, train=False)
        return jnp.round(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255).astype(jnp.uint8)

    variants = {
        "s8skip": jax.jit(build(params, state, model, calib, quant_last=False)),
        "s8skip+last": jax.jit(build(params, state, model, calib,
                                     quant_last=True)),
    }

    x_shape = (args.batch, 128, 128, 3)
    if args.cost_only:
        xz = jnp.zeros(x_shape, jnp.uint8)
        for name, fn in [("int8-v0", step_v0)] + list(variants.items()):
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
    for name, fn in [("int8-v0", step_v0)] + list(variants.items()):
        yi = np.asarray(jax.device_get(fn(probe)), np.float32)
        mse = float(np.mean((yb - yi) ** 2))
        agree = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        print(f"{name:<12}: {measure(fn):9.0f} imgs/s  agree {agree:5.1f} dB",
              flush=True)


if __name__ == "__main__":
    main()
