"""Fused preprocessing + noise-injection Pallas kernel.

The training input path does: uint8 → float [0,1] → add Gaussian noise →
clip → normalize to [-1,1].  As separate jax ops this is several HBM
round-trips plus a Threefry keystream computed by generic VPU code; here it
is one VMEM pass using the TPU's hardware PRNG (pltpu.prng_random_bits) and
a Box-Muller transform on the VPU.

Seeding: pltpu.prng_seed per grid block (seed ⊕ block index) keeps blocks
decorrelated while staying reproducible for a given (seed, shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, x_ref, out_ref, *, sigma01: float):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = x_ref.shape
    # two independent uint32 draws -> Box-Muller normal (bitcast: the raw
    # bits may come back int32; a signed >> would produce negative values
    # and NaNs out of the log)
    u_bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    v_bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniform in (0,1]: (bits >> 8) * 2^-24 + 2^-25 keeps full VPU precision
    # top 24 bits fit positive int32 (Mosaic has int32→f32 but not uint32→f32)
    u24 = pltpu.bitcast(u_bits >> 8, jnp.int32).astype(jnp.float32)
    v24 = pltpu.bitcast(v_bits >> 8, jnp.int32).astype(jnp.float32)
    u1 = u24 * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
    u2 = v24 * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    normal = r * jnp.cos(2.0 * jnp.pi * u2)
    # Mosaic lacks a direct uint8→f32 cast; hop through int32 on the VPU
    x01 = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    noisy = jnp.clip(x01 + sigma01 * normal, 0.0, 1.0)
    out_ref[:] = (noisy * 2.0 - 1.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sigma", "out_dtype"))
def fused_normalize_gaussian_noise(
    seed: jax.Array,
    x_uint8: jax.Array,
    sigma: float = 25.0,
    out_dtype=jnp.bfloat16,
):
    """x_uint8: (N, H, W, C) uint8 → (N, H, W, C) out_dtype in [-1, 1] with
    Gaussian noise (σ on the 0-255 scale, reference noise v1 semantics).

    Grid over the batch: one image per program keeps blocks comfortably in
    VMEM (a 256² RGB image is 768 KB as f32 intermediates).
    """
    n, h, w, c = x_uint8.shape
    # A (…, 3)-channel block would pad its lane dim 3 → 128 in VMEM (42×
    # waste → scoped-VMEM OOM at 128²).  The op is elementwise, so flatten
    # each image to (rows, 128) lanes; pad the tail if HWC % 128 != 0.
    flat = h * w * c
    rows = -(-flat // 128)
    pad = rows * 128 - flat
    xf = x_uint8.reshape(n, flat)
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
    xf = xf.reshape(n, rows, 128)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 else seed.astype(jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, sigma01=float(sigma) / 255.0),
        out_shape=jax.ShapeDtypeStruct((n, rows, 128), out_dtype),
        grid_spec=grid_spec,
    )(seed_arr, xf)
    out = out.reshape(n, rows * 128)
    if pad:
        out = out[:, :flat]
    return out.reshape(n, h, w, c)


def xla_normalize_gaussian_noise(key, x_uint8, sigma=25.0, out_dtype=jnp.bfloat16):
    """XLA fallback with identical semantics (different PRNG stream)."""
    x01 = x_uint8.astype(jnp.float32) / 255.0
    noisy = jnp.clip(
        x01 + (sigma / 255.0) * jax.random.normal(key, x01.shape, jnp.float32),
        0.0, 1.0)
    return (noisy * 2.0 - 1.0).astype(out_dtype)
