"""Post-training int8 quantization for the serving path.

TPU-native capability with no reference counterpart (the reference serves
f32 torch, backend/app.py:392): the v5e MXU runs int8 at 2× the bf16 rate
(394 vs 197 TOPS peak; measured 1.62× on the 64-wide 3×3 convs that
dominate the serving models, benchmarks/kernel_notes.md round 3).

Design: a *transform over the existing model code*, not a parallel model
zoo.  ``ops.conv2d`` / ``ops.conv2d_transpose`` call the hook below on
every invocation; under a calibration context each conv records its
input's max-|x| (one jitted forward over calibration data — the tape
records at trace time and the reductions are the program's outputs), and
under an int8 context each conv re-runs as

    x_i8 = round(clip(x / s_c))          # PER-INPUT-CHANNEL activation
                                         # scales, folded into the weight
                                         # (conv(x/s_c, w·s_c) == conv(x,w),
                                         # SmoothQuant-style)
    y_i32 = conv(x_i8, w_i8)             # MXU int8, i32 accumulation
    y = y_i32 * s_w[c_out]               # per-output-channel scales of the
                                         # folded weight

(Symmetric only, by receipts: an asymmetric zero-point-128 variant for
post-ReLU layers was built and measured — its padding-correction constant
costs 11% throughput at the headline config while the per-channel fold
already delivers every needed dB: esrgan 40.2 dB agreement either way,
and the ReLU families sit at 50-62 dB without it.)

with bias/activation/BN staying in the float dtype around it, so model
definitions (and their reference-parity quirks) are untouched.  Convs the
policy skips (tiny C_in/C_out first/last layers: quality-sensitive and
bandwidth-bound anyway) run the normal float path.

Call order under tracing is deterministic, so calibration entries replay
positionally when the quantized forward is traced — the standard
tape-by-call-site PTQ approach.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

_MODE = contextvars.ContextVar("cid_quant_mode", default=None)


class _Calibrate:
    """Records (max|x|, kernel, per-out-channel axis) per conv call."""

    def __init__(self, quantile: Optional[float] = None):
        self.taps: List[tuple] = []
        self.quantile = quantile


class _Int8Apply:
    """Replays quantized entries positionally; ``entries[i] is None`` means
    'run this conv in float' (skip policy)."""

    def __init__(self, entries: List[Optional[tuple]]):
        self.entries = entries
        self.i = 0


class _BiasCorrectCollect(_Int8Apply):
    """One (jitted) pass that runs the quantized cascade while recording,
    per conv, the per-output-channel mean of (float conv − int8 conv) ON
    THE QUANTIZED NETWORK'S OWN INPUTS (sequential/DFQ-style bias
    correction).  The recorded means are baked into the replay entries as
    additive constants — they fold into the conv bias at compile time, so
    the correction is free at serving time."""

    def __init__(self, entries: List[Optional[tuple]]):
        super().__init__(entries)
        self.corrections: List[Optional[jax.Array]] = []


class _FakeQuant:
    """Differentiable int8 simulation (quantization-aware training).

    Every policy-eligible conv runs the SAME arithmetic as the serving
    int8 path — per-input-channel activation scales folded into the
    weight, per-output-channel weight scales, symmetric round/clip —
    but in f32 with straight-through-estimator rounding, so gradients
    flow to the weights THROUGH the quantizer.  Activation scales are
    dynamic (per batch, stop-gradient), standing in for the serving
    path's static calibration; weight gradients see the fold, so a
    fine-tune can shrink ranges the static calibration will later
    record.

    Exists for checkpoints whose activations outgrow 8 bits — the r4
    ESRGAN trunk regression (kernel_notes.md): the 28k-step retrain
    widened the residual trunk's dynamic range until the all-int8
    program failed the 40 dB serving gate and seven convs had to stay
    float (`ESRGAN_TRUNK_CALLS`).  A short QAT fine-tune under this
    mode re-centers the weights so the full int8 program passes again.
    """

    def __init__(self, skip: Callable):
        self.skip = skip


def _ste_round(v: jax.Array) -> jax.Array:
    """round() with a straight-through gradient (identity backward)."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


@contextlib.contextmanager
def fake_quant(skip: Optional[Callable] = None):
    """Context manager: model.apply calls inside simulate the int8 serving
    path with STE gradients (see _FakeQuant).  ``skip`` defaults to the
    serving default policy; pass a FRESH stateful policy per traced call
    (e.g. ``make_indexed_skip(...)``) if using one."""
    yield_mode = _FakeQuant(skip or default_skip_policy)
    tok = _MODE.set(yield_mode)
    try:
        yield yield_mode
    finally:
        _MODE.reset(tok)


def default_skip_policy(kernel: jax.Array) -> bool:
    """Skip quantization for convs with tiny channel counts: the 3-channel
    image-side layers are bandwidth-bound (not MXU-bound — kernel_notes
    round 3's first-layer receipts) and pixel-adjacent, i.e. all cost and
    no win."""
    c_in, c_out = int(kernel.shape[-2]), int(kernel.shape[-1])
    return c_in < 8 or c_out < 8


def act_scale(amax_c: jax.Array) -> jax.Array:
    """Per-channel int8 activation scale from per-channel ``max|x|``.

    Floors each channel's scale at 1% of the busiest channel's: a channel
    barely excited by the (small) calibration batch would otherwise get a
    near-zero scale and hard-clip any real serve-time activation in it to
    ~0 (review r3 pass-2 finding #2).  1% of the global max costs <7 bits
    of that channel's resolution while bounding the saturation risk.

    THE single definition of the floor recipe: the generic PTQ transform,
    the QAT fake-quant simulation, and quant_unet's s8-skip scale-slicing
    algebra (which slices these scales per concat half) must all stay
    bit-identical or the slicing/QAT silently desynchronize from serving.
    """
    amax_c = jnp.asarray(amax_c, jnp.float32)
    return jnp.maximum(jnp.maximum(amax_c, 0.01 * jnp.max(amax_c)),
                       1e-12) / 127.0


def quantize_weight(kernel: jax.Array, out_axis: int = -1):
    """Symmetric per-output-channel int8 weight quantization."""
    k = jnp.asarray(kernel, jnp.float32)
    reduce_axes = tuple(i for i in range(k.ndim)
                        if i != (out_axis % k.ndim))
    amax = jnp.max(jnp.abs(k), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    # scale broadcastable against (N, H, W, C_out) outputs
    return w_i8, scale.reshape(-1)


def conv_hook(x: jax.Array, kernel: jax.Array, out_axis: int,
              run: Callable) -> Optional[jax.Array]:
    """Called by ops.conv2d / conv2d_transpose before the float conv.

    ``run(x_q, k_q, preferred_element_type)`` executes the underlying
    ``lax.conv_general_dilated`` with substituted operands.  Returns the
    quantized output (pre-bias, in ``x.dtype``), or None → caller runs the
    normal float path."""
    mode = _MODE.get()
    if mode is None:
        return None
    if isinstance(mode, _Calibrate):
        # x's spatial extent lets quantized_fraction weight by FLOPs, not
        # parameter count (a full-res conv carries far more FLOPs/param
        # than a bottleneck conv).  amax is PER CHANNEL (channels differ by
        # orders of magnitude on deep residual trunks — a per-tensor scale
        # crushed ESRGAN to 36 dB agreement; per-channel, folded into the
        # weights, recovers it).
        spatial = int(x.shape[1]) * int(x.shape[2]) if x.ndim == 4 else 1
        xf = jnp.abs(jnp.asarray(x, jnp.float32))
        flat = xf.reshape(-1, xf.shape[-1])
        if mode.quantile is None:
            amax_c = jnp.max(flat, axis=0)
        else:
            # clip rare extremes: a handful of outlier pixels otherwise set
            # the whole channel's step size
            amax_c = jnp.quantile(flat, mode.quantile, axis=0)
        mode.taps.append((amax_c, kernel, out_axis, spatial))
        return None
    if isinstance(mode, _FakeQuant):
        if mode.skip(kernel):
            return None  # float path, exactly like the serving skip
        xf = jnp.asarray(x, jnp.float32)
        # dynamic per-input-channel activation scale: the QAT stand-in for
        # the serving path's static calibration (stop-grad — the scale is
        # quantizer state, not a learnable path; act_scale = the serving
        # floor recipe so near-dead channels don't hard-clip)
        amax_c = jax.lax.stop_gradient(
            jnp.max(jnp.abs(xf).reshape(-1, xf.shape[-1]), axis=0))
        s_c = act_scale(amax_c)
        oa = out_axis % kernel.ndim
        in_axis = 3 if oa == 2 else kernel.ndim - 2
        if int(kernel.shape[in_axis]) != int(s_c.shape[0]):
            s_c = jnp.max(s_c, keepdims=True)  # grouped conv: scalar scale
        fold_shape = [1] * kernel.ndim
        fold_shape[in_axis] = -1 if int(s_c.shape[0]) > 1 else 1
        wf = jnp.asarray(kernel, jnp.float32) * (
            s_c.reshape(fold_shape) if int(s_c.shape[0]) > 1 else s_c[0])
        reduce_axes = tuple(i for i in range(wf.ndim) if i != oa)
        w_scale = jnp.maximum(
            jax.lax.stop_gradient(
                jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)),
            1e-12) / 127.0
        x_q = _ste_round(jnp.clip(xf / s_c, -127.0, 127.0))
        w_q = _ste_round(jnp.clip(wf / w_scale, -127.0, 127.0))
        y = run(x_q, w_q, jnp.float32)
        # dequant: same single per-output-channel multiply as serving
        return (y * w_scale.reshape(-1)).astype(x.dtype)
    if mode.i >= len(mode.entries):
        raise ValueError(
            f"int8 replay over-consumed: conv call #{mode.i} but only "
            f"{len(mode.entries)} entries were calibrated — the model's "
            "conv call sequence changed since quantize_apply() calibrated "
            "it (re-calibrate after any model/topology edit)")
    entry = mode.entries[mode.i]
    mode.i += 1
    if entry is None:
        if isinstance(mode, _BiasCorrectCollect):
            mode.corrections.append(None)
        return None
    w_i8, w_scale, s_c = entry[:3]
    corr = entry[3] if len(entry) > 3 else None
    if tuple(w_i8.shape) != tuple(kernel.shape):
        # Replay is positional (tape-by-call-site); a shape mismatch means
        # the call sequence diverged from calibration and this entry belongs
        # to a different conv.  Fail loudly instead of applying the wrong
        # folded weights (advisor r3 finding #1).
        raise ValueError(
            f"int8 replay mismatch at conv call #{mode.i - 1}: calibrated "
            f"kernel shape {tuple(w_i8.shape)} != traced kernel shape "
            f"{tuple(kernel.shape)} — re-calibrate with quantize_apply()")
    xf = jnp.asarray(x, jnp.float32)
    x_i8 = jnp.clip(jnp.round(xf / s_c), -127, 127).astype(jnp.int8)
    y_i32 = run(x_i8, w_i8, jnp.int32)
    # w_scale carries the folded per-input-channel activation scales, so
    # the dequant is a single per-output-channel multiply
    y = (y_i32.astype(jnp.float32) * w_scale).astype(x.dtype)
    if isinstance(mode, _BiasCorrectCollect):
        # float conv on the SAME (quantized-cascade) input; the output
        # channel is the last axis in NHWC for both conv and conv-transpose.
        # Apply the correction immediately so deeper layers' corrections
        # are computed against the already-corrected cascade (sequential).
        y_f = run(xf, jnp.asarray(kernel, jnp.float32), jnp.float32)
        corr = jnp.mean(y_f - jnp.asarray(y, jnp.float32),
                        axis=tuple(range(y.ndim - 1)))
        mode.corrections.append(corr)
    if corr is not None:
        y = y + corr.astype(y.dtype)
    return y


@contextlib.contextmanager
def _mode(m):
    tok = _MODE.set(m)
    try:
        yield
    finally:
        _MODE.reset(tok)


def quantize_apply(model, params, state, calib_x,
                   skip: Callable = default_skip_policy,
                   act_quantile: Optional[float] = None,
                   bias_correct: bool = False):
    """Build an int8-quantized eval forward for ``model``.

    One jitted forward over ``calib_x`` (a representative input batch in the
    model's serving domain) records per-conv activation ranges; weights get
    per-output-channel scales.  Returns ``qapply(x) -> y`` (jittable, eval
    mode), with the int8 weights baked in as program constants.

    ``act_quantile``: per-channel activation ranges use this |x| quantile
    instead of the max (e.g. 0.999 — clips rare extremes so outlier pixels
    don't set a channel's step size).  None (default) = exact max.

    ``bias_correct``: one extra jitted pass records, per conv, the mean
    per-output-channel error of the int8 conv vs the float conv on the
    quantized cascade's own inputs, and bakes the negated mean into the
    replay as an additive constant (sequential/DFQ-style bias correction).
    Free at serving time (folds into the bias add); held-out receipts
    (benchmarks/bias_correct_probe.py, shipped weights): denoise +0.60,
    dncnn +0.50, esrgan +1.04, srgan +0.79, cgan +0.34 dB agreement.
    """
    # the calibration pass runs under jit: the contextvar tape records at
    # trace time (kernels/axes are concrete — params are closed over), and
    # the per-conv amax/quantile reductions come back as the compiled
    # program's outputs.  One compiled forward instead of per-op eager
    # dispatch — on the CPU test backend the eager quantile pass cost
    # ~400 s for ESRGAN, and on the tunneled dev TPU eager calibration
    # dominates server startup.
    calib = _Calibrate(quantile=act_quantile)

    def _calibrate(x):
        calib.taps.clear()
        with _mode(calib):
            model.apply(params, state, x, train=False)
        return [t[0] for t in calib.taps]

    amaxes = jax.jit(_calibrate)(calib_x)
    if not calib.taps:
        raise ValueError("no convs were traced — nothing to quantize")
    taps = [(a, k, oa, sp)
            for a, (_, k, oa, sp) in zip(amaxes, calib.taps)]
    entries: List[Optional[tuple]] = []
    for amax_c, kernel, out_axis, _ in taps:
        if skip(kernel):
            entries.append(None)
            continue
        s_c = act_scale(amax_c)  # 1%-of-busiest-channel floor, see act_scale
        # fold the per-input-channel activation scales into the weight
        # before quantizing it: conv(x/s_c, w*s_c) == conv(x, w) exactly,
        # and the folded weight's per-output-channel quantization absorbs
        # the channel spread (weights tolerate int8 far better than a
        # per-tensor activation scale does)
        oa = out_axis % kernel.ndim
        in_axis = 3 if oa == 2 else kernel.ndim - 2  # the other channel axis
        if int(kernel.shape[in_axis]) != int(s_c.shape[0]):
            # grouped conv: kernel's in-axis is C_in//groups, so the
            # per-channel fold can't apply — drop to one scalar scale
            # (exactly the pre-fold scheme, still correct for any groups)
            s_c = jnp.max(s_c, keepdims=True)
        fold_shape = [1] * kernel.ndim
        fold_shape[in_axis] = -1 if int(s_c.shape[0]) > 1 else 1
        w_folded = (jnp.asarray(kernel, jnp.float32)
                    * (s_c.reshape(fold_shape) if int(s_c.shape[0]) > 1
                       else s_c[0]))
        w_i8, w_scale = quantize_weight(w_folded, out_axis)
        entries.append((w_i8, w_scale, s_c))

    if bias_correct:
        # run the collect pass under jit: the contextvar tape works at
        # trace time, the per-conv correction means come back as the
        # program's outputs — one compiled forward instead of minutes of
        # per-op eager dispatch (which on the tunneled dev TPU would make
        # server startup unusable)
        def _collect(x):
            ctx = _BiasCorrectCollect(list(entries))
            with _mode(ctx):
                model.apply(params, state, x, train=False)
            if len(ctx.corrections) != len(entries):
                raise ValueError(
                    f"bias-correction pass traced {len(ctx.corrections)} "
                    f"convs but {len(entries)} were calibrated")
            return [c for c in ctx.corrections if c is not None]

        # means converge on far fewer pixels than the max-based activation
        # scales need, so the collect pass runs on a strided subsample
        # (≤8 images, ≤48² center crop) — the full pass at calibration
        # size is dominated by int8 convs, which cost ~40× f32 on the CPU
        # backends the tests run on
        sub = calib_x[:: max(1, calib_x.shape[0] // 8)][:8]
        if sub.ndim == 4 and sub.shape[1] > 48 and sub.shape[2] > 48:
            h0 = (sub.shape[1] - 48) // 2
            w0 = (sub.shape[2] - 48) // 2
            sub = sub[:, h0:h0 + 48, w0:w0 + 48, :]
        got = iter(jax.jit(_collect)(sub))
        entries = [None if e is None else (*e, next(got)) for e in entries]

    def qapply(x):
        ctx = _Int8Apply(list(entries))
        with _mode(ctx):
            y, _ = model.apply(params, state, x, train=False)
        if ctx.i != len(ctx.entries):
            raise ValueError(
                f"int8 replay under-consumed: {ctx.i} conv calls traced but "
                f"{len(ctx.entries)} entries were calibrated — the model's "
                "conv call sequence changed since quantize_apply() "
                "calibrated it (re-calibrate after any model/topology edit)")
        return y

    return qapply


def quantized_fraction(model, params, state, calib_x,
                       skip: Callable = default_skip_policy) -> float:
    """Fraction of conv FLOPs the policy quantizes (observability).

    FLOPs per conv ≈ input spatial positions × kernel parameters (exact for
    the stride-1 SAME convs these models are made of; strided convs are
    over-counted by the stride factor, which only makes the reported
    quantized fraction conservative since policy-skipped layers here are
    full-resolution).

    The tape pass runs under ``jax.eval_shape`` — taps record kernel/input
    SHAPES at trace time with zero device compute (an eager pass here costs
    the same ~400 s ESRGAN-on-CPU stall quantize_apply's jitted calibration
    exists to avoid; this function only consumes shapes)."""
    calib = _Calibrate()
    with _mode(calib):
        jax.eval_shape(
            lambda p, s, x: model.apply(p, s, x, train=False),
            params, state, calib_x)
    tot = q = 0.0
    for _, kernel, _, spatial in calib.taps:
        f = float(jnp.size(kernel)) * spatial
        tot += f
        if not skip(kernel):
            q += f
    return q / max(tot, 1.0)


def make_indexed_skip(float_call_indices, base: Callable = default_skip_policy):
    """Per-call-index skip policy: ORs ``base`` with membership of the conv's
    CALL INDEX (tape order) in ``float_call_indices``.  Stateful — build a
    fresh one per ``quantize_apply`` call.

    Exists for ESRGAN's residual trunk: the round-4 28k-step checkpoint
    grew the trunk's dynamic range (per-layer receipts in kernel_notes.md
    "ESRGAN int8 regression") until 8 bits can't represent the block-input
    activations — the trunk-input convs (call indices 3,5,...,15 for 8
    blocks) measure 25-29 dB isolated SNR and drag full-program agreement
    to ~34 dB, below the 40 dB serving gate, which correctly rejected the
    transform (esrgan silently served float).  Keeping those seven convs
    float and the nine well-conditioned ones int8 restores 40.9 dB
    held-out / 42.3 dB on the gate probe.  Quantile clipping does NOT fix
    it (the trunk genuinely uses its range — measured, same receipts)."""
    float_set = set(int(i) for i in float_call_indices)

    class _Skip:
        def __init__(self):
            self.i = -1

        def __call__(self, kernel):
            self.i += 1
            return base(kernel) or self.i in float_set

    return _Skip()


# ESRGANGenerator(num_residuals=8) conv-call indices whose input is the
# residual trunk (block b's first conv = call 1+2b; block 0's input is the
# well-conditioned head output, so it stays int8)
ESRGAN_TRUNK_CALLS = tuple(1 + 2 * b for b in range(1, 8))
