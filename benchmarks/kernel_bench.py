"""Kernel autotune receipts: Pallas vs XLA on the live chip.

Benchmarks each Pallas kernel against its XLA-fallback twin with the fenced
methodology (chained, scalar-fetch).  The faster implementation is the one
the framework should route to; results are printed as JSON lines for the
record.  Run on TPU: python benchmarks/kernel_bench.py

⚠ WARNING (this dev environment): compiled Pallas kernels have twice wedged
the tunneled v5e worker (recovery ~75 min).  Do not run this alongside
anything that needs the chip; bench.py and all default compute paths are
intentionally XLA-only.  See memory note axon-tpu-quirks / kernel_notes.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# runnable straight from a source checkout
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "celebrity_image_denoiser_tpu")):
    sys.path.insert(0, _REPO)


def _fence(y):
    import jax

    np.asarray(jax.device_get(jax.numpy.ravel(y)[0]))


def _time(fn, x, iters=10):
    y = fn(x)
    _fence(y)
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = fn(cur)
    _fence(cur)
    return (time.perf_counter() - t0) / iters


def bench_noise_kernel(batch=256, hw=128):
    import jax
    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.ops.pallas import noise_kernel

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(0, 256, (batch, hw, hw, 3), dtype=np.uint8))

    def pallas_fn(xu):
        out = noise_kernel.fused_normalize_gaussian_noise(jnp.int32(1), xu)
        # chain: requantize so the next iteration gets uint8 again
        return ((out * 0.5 + 0.5) * 255).astype(jnp.uint8)

    key = jax.random.PRNGKey(0)

    def xla_fn(xu):
        out = noise_kernel.xla_normalize_gaussian_noise(key, xu)
        return ((out * 0.5 + 0.5) * 255).astype(jnp.uint8)

    tp = _time(jax.jit(pallas_fn), x)
    tx = _time(jax.jit(xla_fn), x)
    n = batch
    return {
        "kernel": "normalize+gaussian_noise",
        "pallas_imgs_per_s": round(n / tp, 1),
        "xla_imgs_per_s": round(n / tx, 1),
        "winner": "pallas" if tp < tx else "xla",
    }


def bench_conv_v2(batch=32, hw=64, cin=128, cout=128):
    import jax
    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu import ops
    from celebrity_image_denoiser_tpu.ops.pallas import conv_fused

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((batch, hw, hw, cin)).astype(np.float32)
                       .astype(jnp.bfloat16))
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    b = jnp.zeros((cout,), jnp.bfloat16)

    pallas_fn = jax.jit(lambda x: conv_fused.conv3x3_bias_relu_v2(x, w, b))
    xla_fn = jax.jit(lambda x: jnp.maximum(ops.conv2d(x, w, b, stride=1, padding=1), 0))
    tp = _time(pallas_fn, x)
    tx = _time(xla_fn, x)
    flops = 2 * batch * hw * hw * cin * cout * 9
    return {
        "kernel": "conv3x3_bias_relu (v2 shifted-inputs)",
        "pallas_tflops": round(flops / tp / 1e12, 1),
        "xla_tflops": round(flops / tx / 1e12, 1),
        "winner": "pallas" if tp < tx else "xla",
    }


def main():
    print(json.dumps(bench_noise_kernel()))
    try:
        print(json.dumps(bench_conv_v2()))
    except Exception as e:
        print(json.dumps({"kernel": "conv3x3_bias_relu (v2)",
                          "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
