"""Per-op HBM-traffic ranking for a compiled headline step.

Parses the optimized HLO of the jitted int8 (or bf16) denoise serve step
and ranks top-level instructions by operand+result bytes, attributing
every byte to the instruction that reads/writes it.  This is the receipt
layer under benchmarks/cost_analysis.py's whole-program numbers: it shows
WHICH tensors carry the ~70 GB/step, so a traffic optimization can target
the actual top buffers instead of a guess.

Usage: python benchmarks/hlo_traffic.py [--batch 2048] [--mode int8|bf16]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_SHAPE_RE = re.compile(r"\b(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|f64)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum bytes of every dtype[shape] literal in `text` (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _lower_train_step(family: str, compute_dtype: str, batch, size,
                      remat: bool = False):
    """Compile one jitted GAN train step (the exact program train_bench.py
    times — shared construction via train_bench.build_train_step) and return
    its optimized HLO — per-op attribution for the train bytes-roofline
    receipts (VERDICT r4 next #3: locate the GB/step)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_bench import build_train_step

    from celebrity_image_denoiser_tpu.core import prng
    from celebrity_image_denoiser_tpu.data.synthetic import synth_clean_batch

    init_fn, step_fn, batch, size = build_train_step(
        family, compute_dtype, batch=batch, size=size, remat=remat)
    carry = init_fn(prng.key(0))
    clean = synth_clean_batch(prng.key(1), batch, size) * 2.0 - 1.0
    lr = jnp.float32(1e-4)
    return step_fn.lower(carry, clean, clean, prng.key(2), lr, lr).compile()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--mode", choices=["int8", "bf16", "s8skip"],
                    default="int8")
    ap.add_argument("--train", default=None,
                    metavar="FAMILY",
                    help="rank the TRAIN step of this family instead of the "
                         "serve step (denoise|srgan|esrgan|cgan|dncnn)")
    ap.add_argument("--size", type=int, default=None,
                    help="image size override (train mode)")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="train-mode compute dtype")
    ap.add_argument("--remat", action="store_true",
                    help="train mode: attribute the jax.checkpoint variant "
                         "(the program train_bench --remat times)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.train:
        compiled = _lower_train_step(args.train, args.compute_dtype,
                                     args.batch, args.size, remat=args.remat)
        _rank(compiled.as_text(),
              f"train:{args.train} dtype={args.compute_dtype}"
              + (" remat" if args.remat else ""), args.top)
        return
    args.batch = args.batch or 2048

    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core import prng
    from celebrity_image_denoiser_tpu.data.synthetic import calibration_batch
    from celebrity_image_denoiser_tpu.ops import quant

    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if args.mode in ("int8", "s8skip"):
        if args.mode == "s8skip":
            from celebrity_image_denoiser_tpu.ops.quant_unet import (
                quantize_apply_denoise_unet,
            )

            qapply = quantize_apply_denoise_unet(
                model, params, state, calibration_batch(tanh=True))
        else:
            qapply = quant.quantize_apply(model, params, state,
                                          calibration_batch(tanh=True))

        def step(params, state, x_uint8):
            x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
            y = qapply(x)
            return jnp.round(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255).astype(jnp.uint8)
    else:
        def step(params, state, x_uint8):
            x = x_uint8.astype(jnp.bfloat16) * (2.0 / 255.0) - 1.0
            y, _ = model.apply(params, state, x, train=False)
            return jnp.round(jnp.clip(y * 0.5 + 0.5, 0, 1) * 255).astype(jnp.uint8)

    x = jnp.zeros((args.batch, 128, 128, 3), jnp.uint8)
    compiled = jax.jit(step).lower(bf16_params, state, x).compile()
    _rank(compiled.as_text(), f"mode={args.mode} batch={args.batch}",
          args.top)


def _rank(hlo: str, label: str, top: int):
    # entry computation only: lines 'name = dtype[shape] op(operands...)'
    entry = []
    in_entry = False
    for line in hlo.splitlines():
        s = line.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if s == "}":
                break
            entry.append(s)

    # operand shapes: resolve %name references against definitions
    defs = {}
    rows = []
    for s in entry:
        m = re.match(r"(?:ROOT )?([%\w.\-]+) = (.+)", s)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        # result shape = first shape literal(s) before the op name.  Tuple
        # results may nest parens inside layout annotations
        # ("(bf16[...]{3,0:T(8,128)(2,1)}, ...) fusion(..."), so find the
        # op name as the last word before the first top-level "(" that
        # FOLLOWS the balanced result text.
        if rhs.startswith("("):
            depth, i = 0, 0
            for i, ch in enumerate(rhs):
                depth += (ch == "(") - (ch == ")")
                if depth == 0:
                    break
            result_txt, rest = rhs[: i + 1], rhs[i + 1:].lstrip()
        else:
            result_txt, _, rest = rhs.partition(" ")
        opm = re.match(r"(\w[\w\-]*)\(", rest)
        op = opm.group(1) if opm else "?"
        out_b = shape_bytes(result_txt)
        # operand bytes: look up each %ref / bare name used as an arg
        # (scan only past the result text so result shapes can't alias)
        arg_b = 0
        paren = rest[rest.find("("):] if "(" in rest else ""
        for ref in re.findall(r"%?([\w.\-]+)", paren):
            if ref in defs:
                arg_b += defs[ref]
        defs[name.lstrip("%")] = out_b
        if op in ("parameter", "constant"):
            continue
        rows.append((out_b + arg_b, out_b, arg_b, op, name, rhs[:110]))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{label} total attributed traffic: {total/1e9:.1f} GB")
    for tot, out_b, arg_b, op, name, rhs in rows[:top]:
        print(f"{tot/1e9:7.2f} GB (out {out_b/1e9:6.2f} + in {arg_b/1e9:6.2f})"
              f"  {op:<12} {rhs}")


if __name__ == "__main__":
    main()
