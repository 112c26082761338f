"""Receipt probe: float-vs-int8 serving-step device time per (size, batch).

VERDICT r3 next #1: under the mixed-shape 32-way load receipt the int8
serving path measured 6.85 vs 9.48 req/s float at continuous-batching
occupancies ~4-7, while winning 1.2x at the device-resident b2048 headline.
This probe isolates WHERE the crossover sits: the full fused serving step
(u8 -> float01 -> DnCNN -> clip -> u8, exactly handlers._forward's program)
for both paths across batch occupancies, fenced and chained per
CLAUDE.md's tunnel methodology.  The shipped dncnn weights and the
serving-identical calibration recipe (handlers._maybe_quantize) make the
timed programs the ones the live server would run.

Emits one JSON line per (size, batch, path) plus a final summary line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from celebrity_image_denoiser_tpu.core import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from celebrity_image_denoiser_tpu import models  # noqa: E402
from celebrity_image_denoiser_tpu.ckpt import load_checkpoint  # noqa: E402
from celebrity_image_denoiser_tpu.core import prng  # noqa: E402
from celebrity_image_denoiser_tpu.data.synthetic import (  # noqa: E402
    calibration_batch,
)
from celebrity_image_denoiser_tpu.ops import quant  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512")
    ap.add_argument("--batches", default="1,4,16")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    batches = [int(b) for b in args.batches.split(",")]

    model = models.DnCNN()
    params, state = model.init(prng.key(0))
    wdir = os.path.join(_REPO, "weights", "dncnn")
    if os.path.isdir(wdir):
        sections, _ = load_checkpoint(wdir)
        params = sections.get("generator", params)
        state = sections.get("generator_state", state) or state

    # serving-identical calibration + bias correction: the SAME helper and
    # options handlers._maybe_quantize's generic rung uses, so the timed
    # int8 program IS the served one (the r4 receipts in kernel_notes.md
    # predate this and were taken with a then-seed-identical inline recipe
    # without bias_correct; bias correction folds into the bias add, so the
    # timing is unchanged — only program identity is tightened here)
    qapply = quant.quantize_apply(model, params, state,
                                  calibration_batch(tanh=False),
                                  bias_correct=True)

    @jax.jit
    def step_f(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        y, _ = model.apply(params, state, x, train=False)
        return (jnp.clip(y, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    @jax.jit
    def step_q(x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        y = qapply(x)
        return (jnp.clip(y, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    def fence(y):
        np.asarray(jax.device_get(y[0, 0, 0, 0]))

    rng = np.random.default_rng(0)
    rows = []
    for s in sizes:
        for b in batches:
            x = jax.device_put(
                rng.integers(0, 256, (b, s, s, 3), dtype=np.uint8))
            for name, step in (("float", step_f), ("int8", step_q)):
                t0 = time.perf_counter()
                fence(step(x))  # compile + warm
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                cur = x
                for _ in range(args.iters):
                    cur = step(cur)
                fence(cur)
                dt = (time.perf_counter() - t0) / args.iters
                rows.append({"size": s, "batch": b, "path": name,
                             "ms": round(dt * 1e3, 2),
                             "imgs_s": round(b / dt, 1),
                             "compile_s": round(compile_s, 1)})
                print(json.dumps(rows[-1]), flush=True)

    # crossover summary: per size, the smallest batch where int8 wins
    summary = {}
    for s in sizes:
        win = [b for b in batches
               if next(r for r in rows if r["size"] == s and r["batch"] == b
                       and r["path"] == "int8")["ms"]
               < next(r for r in rows if r["size"] == s and r["batch"] == b
                      and r["path"] == "float")["ms"]]
        summary[str(s)] = min(win) if win else None
    print(json.dumps({"bench": "int8_crossover", "iters": args.iters,
                      "int8_wins_from_batch": summary}), flush=True)


if __name__ == "__main__":
    main()
