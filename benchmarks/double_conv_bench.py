"""On-chip receipt for the fused double-conv kernel (ops/pallas/double_conv).

Compares XLA's sequential conv+ReLU pair against the Pallas fused kernel at
the U-Net enc-block shape, with the fenced-chained methodology from
benchmarks/kernel_notes.md (block_until_ready is not a barrier through the
axon tunnel).  CAUTION: compiles Pallas on the remote v5e worker (~200 s per
variant; a Mosaic fault can wedge the worker for 20-75 min) — run
deliberately, not casually.

    python benchmarks/double_conv_bench.py [--skip-kpack] [--batch 32]
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

from celebrity_image_denoiser_tpu import ops  # noqa: E402
from celebrity_image_denoiser_tpu.ops.pallas import double_conv  # noqa: E402


def fence(y):
    np.asarray(jax.device_get(y.reshape(-1)[0]))


def bench(fn, x, iters=20):
    """Chain iters calls inside ONE jitted scan — per-call dispatch through
    the axon tunnel is ~ms and would otherwise dominate the measurement."""

    @jax.jit
    def many(x0):
        def body(c, _):
            return fn(c * 0.0 + x0), None

        return jax.lax.scan(body, x0, None, length=iters)[0]

    fence(many(x))  # compile + warm
    t0 = time.perf_counter()
    fence(many(x))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--skip-kpack", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tile-h", type=int, default=16)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    n, s, c = args.batch, args.size, args.ch
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((n, s, s, c)).astype(np.float32) * 0.5, dt))
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * .05, dt)
    b1 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * .05, dt)
    b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32), jnp.float32)
    flops = 2 * n * 9 * (s * s * c * c * 2)  # two convs

    @jax.jit
    def xla_pair(x):
        h = jnp.maximum(ops.conv2d(x, w1, b1, stride=1, padding=1), 0)
        return jnp.maximum(ops.conv2d(h, w2, b2, stride=1, padding=1), 0)

    t = bench(xla_pair, x)
    ref = xla_pair(x)
    print(json.dumps({"variant": "xla_pair", "ms": round(t * 1e3, 2),
                      "tflops": round(flops / t / 1e12, 2)}), flush=True)

    variants = [("pallas_fused", False)]
    if not args.skip_kpack:
        variants.append(("pallas_fused_kpack", True))
    for name, kpack in variants:
        def fused(x, kpack=kpack):
            return double_conv.double_conv3x3_relu(
                x, w1, b1, w2, b2, tile_h=args.tile_h, kpack=kpack)

        print(f"compiling {name} (remote Mosaic, ~200 s)...",
              file=sys.stderr, flush=True)
        t = bench(fused, x)
        err = float(jnp.max(jnp.abs(fused(x).astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(json.dumps({"variant": name, "ms": round(t * 1e3, 2),
                          "tflops": round(flops / t / 1e12, 2),
                          "max_abs_err_vs_xla": err}), flush=True)


if __name__ == "__main__":
    main()
