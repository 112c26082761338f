"""s8 skip-storage int8 forward for the denoise U-Net family.

Specialization of the generic PTQ transform (ops/quant.py) for
``models.DenoiseGenerator`` (reference backend/app.py:39-103).  The generic
transform leaves every dual-consumer tensor in bf16 — the U-Net skips e1/e2
(consumed by pool AND by a decoder concat), the conv-transpose outputs
(consumed by a concat), and the float last conv's input.  Those buffers are
exactly where the headline step's HBM traffic lives (benchmarks/
kernel_notes.md "Round 4": 70.3 GB/step, bandwidth floor 86 ms of the
measured 145 ms).

This builder instead *stores the skips as s8*, using three algebraic facts:

1. A concat input's per-channel scales are slices of the consuming conv's
   calibrated per-input-channel scales, so e1 stored at ``s10[64:]`` and the
   up1 output stored at ``s10[:64]`` concatenate into exactly the tensor the
   generic transform would have quantized — but each half is produced s8 in
   its conv's fused epilogue, so bf16 never materializes.
2. max-pool commutes with a positive per-channel scale and with round
   (both monotone), so pooling the s8 skip IS the pooled activation
   quantized at the same scale — zero extra rounding error.  The conv after
   the pool folds the *storage* scale (a per-channel superset of its own
   calibrated range: pooling only discards values) instead of its own.
3. The 64→3 last conv runs int8 too (``quantize_weight`` per-out-channel),
   so its 64-wide @full-res input also stores s8.

On-chip receipts (kernel_notes.md): 70.3→37.9 GB/step, 14.1k→19.8k imgs/s
at b2048 128², 58.9 dB agreement vs the bf16 step (gate: 40 dB).

The odd-size skip-crop quirk (app.py:90-92,97-99) is preserved — shapes are
static under jit, so the crop is a compile-time slice of the s8 buffer.

Contract matches ``quant.quantize_apply``: ``build(...) -> qapply`` with
``qapply(x) -> y`` jittable, x in the model's serving domain ([-1,1]),
y the tanh output, weights baked in as program constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from celebrity_image_denoiser_tpu.ops import quant

_DN = ("NHWC", "HWIO", "NHWC")


def _q(x, s):
    """Quantize activations to s8 with per-channel scales ``s`` (f32[C])."""
    xi = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(xi, -127, 127).astype(jnp.int8)


def _conv_q(x_s8, w_i8, w_scale, bias):
    y = lax.conv_general_dilated(
        x_s8, w_i8, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * w_scale).astype(jnp.bfloat16) + bias


def _convt_q(x_s8, w_i8, w_scale, bias):
    # 2×2 stride-2 transpose conv as a fractionally-strided conv, identical
    # formulation to ops/conv.py::conv2d_transpose
    k2 = jnp.swapaxes(jnp.flip(w_i8, axis=(0, 1)), 2, 3)
    y = lax.conv_general_dilated(
        x_s8, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=_DN,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * w_scale).astype(jnp.bfloat16) + bias


def _conv_f(x, w, bias):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.float32)
    return y.astype(x.dtype) + bias.astype(x.dtype)


def _maxpool_s8(x):
    return lax.reduce_window(x, jnp.int8(-128), lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def _conv_i32(x_s8, w_i8):
    return lax.conv_general_dilated(
        x_s8, w_i8, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32)


def quantize_apply_denoise_unet(model, params, state, calib_x,
                                quant_last: bool = True,
                                split_concat: bool = False):
    """Build the s8 skip-storage int8 eval forward for a DenoiseGenerator.

    ``quant_last=False`` keeps the 64→3 tail conv on the float path (the
    ablation benchmarks/s8_skip_probe.py measures: 19,382 vs 19,798 imgs/s).

    ``split_concat=True`` — kept as a REJECTED-by-receipt experiment — runs
    each decoder conv as two half-input convs (``conv(concat(a, b), W) ==
    conv(a, W[:,:,:Ca]) + conv(b, W[:,:,Ca:])``, exact in i32) with the
    first partial stored s8 at a calibrated per-out-channel scale, to
    delete the concat buffers.  The on-chip cost receipt (kernel_notes.md
    r4 "split-concat") shows XLA ALREADY elides the s8 concats — producers
    write straight into slices of the consumer's input buffer — so the
    split's partial round-trips are pure added traffic: 44.36 GB/step vs
    37.92 for plain s8-skip+last, at −0.1 dB agreement.  Not a serving
    rung; exercised by benchmarks/s8_skip_probe.py and a CPU agreement
    test so the receipt stays reproducible.

    Raises ``ValueError`` if the traced conv sequence doesn't match the
    12-conv U-Net topology (callers fall back to the generic transform —
    serve/handlers._maybe_quantize's warn-and-continue)."""
    # jitted calibration, same tape-at-trace-time mechanism as
    # quant.quantize_apply: one compiled forward instead of ~12 per-op
    # eager dispatches (which dominate server startup on the tunneled dev
    # TPU — this builder is the DEFAULT serving rung for the flagship)
    tap = quant._Calibrate()

    def _calibrate(x):
        tap.taps.clear()
        with quant._mode(tap):
            model.apply(params, state, x, train=False)
        return [t[0] for t in tap.taps]

    amaxes = jax.jit(_calibrate)(calib_x)
    tap.taps = [(a, k, oa, sp)
                for a, (_, k, oa, sp) in zip(amaxes, tap.taps)]
    expected = [  # (kH, kW, in/out layout) per call — the U-Net topology
        (3, 3, 3, 64), (3, 3, 64, 64), (3, 3, 64, 128), (3, 3, 128, 128),
        (3, 3, 128, 256), (3, 3, 256, 256), (2, 2, 128, 256),
        (3, 3, 256, 128), (3, 3, 128, 128), (2, 2, 64, 128),
        (3, 3, 128, 64), (3, 3, 64, 3),
    ]
    got = [tuple(int(d) for d in t[1].shape) for t in tap.taps]
    if got != expected:
        raise ValueError(
            f"not the denoise U-Net conv sequence (got {got}); use "
            "quant.quantize_apply instead")

    def scale_of(i):
        # quant.act_scale IS the serving floor recipe — the scale-slicing
        # algebra below is only valid while these stay bit-identical
        return quant.act_scale(tap.taps[i][0])

    s = [scale_of(i) for i in range(12)]
    s_e1 = s[10][64:]   # e1 storage scale = upconv1.0's last-64 slice
    s_e2 = s[7][128:]   # e2 storage scale = upconv2.0's last-128 slice
    fold_scale = {1: s[1], 2: s_e1, 3: s[3], 4: s_e2, 5: s[5], 6: s[6],
                  7: s[7], 8: s[8], 9: s[9], 10: s[10], 11: s[11]}

    def fold(i, out_axis=-1):
        kernel, sc = tap.taps[i][1], fold_scale[i]
        oa = out_axis % kernel.ndim
        in_axis = 3 if oa == 2 else kernel.ndim - 2
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
    b = {i: jnp.asarray(v, jnp.bfloat16) for i, v in {
        0: p["down1"]["0"]["bias"], 1: p["down1"]["2"]["bias"],
        2: p["down2"]["0"]["bias"], 3: p["down2"]["2"]["bias"],
        4: p["bottleneck"]["0"]["bias"], 5: p["bottleneck"]["2"]["bias"],
        6: p["up2"]["bias"], 7: p["upconv2"]["0"]["bias"],
        8: p["upconv2"]["2"]["bias"], 9: p["up1"]["bias"],
        10: p["upconv1"]["0"]["bias"], 11: p["upconv1"]["2"]["bias"],
    }.items()}
    W0 = jnp.asarray(p["down1"]["0"]["kernel"], jnp.bfloat16)
    W11 = jnp.asarray(p["upconv1"]["2"]["kernel"], jnp.bfloat16)
    relu = jax.nn.relu

    def _to_first_concat(x):
        """Encoder + bottleneck + up2: everything before decoder conv 7."""
        h = relu(_conv_f(x.astype(jnp.bfloat16), W0, b[0]))
        h = _q(h, s[1])                                  # → conv0 epilogue s8
        e1 = _q(relu(_conv_q(h, *W[1], b[1])), s_e1)     # e1 stored s8
        h = _q(relu(_conv_q(_maxpool_s8(e1), *W[2], b[2])), s[3])
        e2 = _q(relu(_conv_q(h, *W[3], b[3])), s_e2)     # e2 stored s8
        h = _q(relu(_conv_q(_maxpool_s8(e2), *W[4], b[4])), s[5])
        bo = _q(relu(_conv_q(h, *W[5], b[5])), s[6])
        d2a = _q(_convt_q(bo, *W[6], b[6]), s[7][:128])
        if d2a.shape[1:3] != e2.shape[1:3]:              # skip-crop quirk
            e2 = e2[:, : d2a.shape[1], : d2a.shape[2], :]
        return d2a, e2, e1

    def _conv7_concat(d2a, e2):
        return _q(relu(_conv_q(jnp.concatenate([d2a, e2], -1), *W[7], b[7])),
                  s[8])

    def _mid(h7, e1):
        """Decoder conv 8 + up1: between the two concat consumers."""
        d2 = _q(relu(_conv_q(h7, *W[8], b[8])), s[9])
        d1a = _q(_convt_q(d2, *W[9], b[9]), s[10][:64])
        if d1a.shape[1:3] != e1.shape[1:3]:              # skip-crop quirk
            e1 = e1[:, : d1a.shape[1], : d1a.shape[2], :]
        return d1a, e1

    if split_concat:
        w7, ws7 = W[7]
        w10, ws10 = W[10]

        def _partial_stats(x):
            # per-out-channel amax of each first-half partial sum, measured
            # on the concat-exact path (the split path differs from it only
            # by the rounding these scales introduce)
            d2a, e2, e1 = _to_first_concat(x)
            pa7 = _conv_i32(d2a, w7[:, :, :128, :]).astype(jnp.float32) * ws7
            d1a, _ = _mid(_conv7_concat(d2a, e2), e1)
            pa10 = (_conv_i32(d1a, w10[:, :, :64, :]).astype(jnp.float32)
                    * ws10)
            return (jnp.max(jnp.abs(pa7), axis=(0, 1, 2)),
                    jnp.max(jnp.abs(pa10), axis=(0, 1, 2)))

        a7, a10 = jax.jit(_partial_stats)(calib_x)

        sA7, sA10 = quant.act_scale(a7), quant.act_scale(a10)

        def _split(a_s8, b_s8, w_i8, w_scale, sA, bias):
            # conv(concat(a,b), W) = conv(a, W[:Ca]) + conv(b, W[Ca:]),
            # exact in i32; the first partial round-trips HBM s8 at the
            # calibrated scale, the second conv's epilogue adds it back
            ca = a_s8.shape[-1]
            pA = (_conv_i32(a_s8, w_i8[:, :, :ca, :]).astype(jnp.float32)
                  * w_scale)
            qA = _q(pA, sA)
            pB = (_conv_i32(b_s8, w_i8[:, :, ca:, :]).astype(jnp.float32)
                  * w_scale)
            return ((pB + qA.astype(jnp.float32) * sA)
                    .astype(jnp.bfloat16) + bias)

    def qapply(x):
        in_dtype = x.dtype
        d2a, e2, e1 = _to_first_concat(x)
        if split_concat:
            h7 = _q(relu(_split(d2a, e2, w7, ws7, sA7, b[7])), s[8])
        else:
            h7 = _conv7_concat(d2a, e2)
        d1a, e1 = _mid(h7, e1)
        if split_concat:
            h = relu(_split(d1a, e1, w10, ws10, sA10, b[10]))
        else:
            h = relu(_conv_q(jnp.concatenate([d1a, e1], -1), *W[10], b[10]))
        if quant_last:
            y = _conv_q(_q(h, s[11]), *W[11], b[11])
        else:
            y = _conv_f(h, W11, b[11])
        return jnp.tanh(y).astype(in_dtype)

    return qapply
