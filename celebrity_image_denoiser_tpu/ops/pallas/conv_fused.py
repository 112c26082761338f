"""Implicit-GEMM 3×3 convolution with fused bias + ReLU (Pallas, MXU).

Shifted-matmul formulation: for a 'same' 3×3 conv,
    y[p, :] = Σ_{k=0..8} x_shift_k[p, :] @ W_k,   W_k: (C_in, C_out)
The padded input stays in HBM; each grid step DMAs its (tile_h+2)-row halo
window into VMEM (overlapping windows need element-granular slicing, hence a
manual async copy rather than a BlockSpec), runs the nine
(tile_h·W, C_in) × (C_in, C_out) MXU contractions accumulating in f32, then
applies bias + ReLU and writes the output tile — one HBM read and one HBM
write per activation, epilogue fused.

STATUS (receipts in benchmarks/kernel_notes.md):
* ``conv3x3_bias_relu_v2`` (shifted-inputs, below) — compiled and exact on
  the v5e (2e-6 vs XLA), measured 8.1 TFLOPS vs XLA's 9.9 at batch 32×64²
  ×128ch bf16 → the production conv dispatch stays
  ``lax.conv_general_dilated`` (~66% MXU utilization on the U-Net), by
  measurement rather than assumption.
* ``conv3x3_bias_relu`` (v1, manual HBM→VMEM DMA of overlapping windows) —
  interpret-mode correct, but the compiled DMA path has faulted the v5e
  worker through this environment's tunnel; gated experimental.
The production Pallas kernel that *does* beat XLA is
ops/pallas/noise_kernel.py (+3.7% on the fused preprocess+noise pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_vmem, acc_ref, sem, *,
            tile_h: int, width: int, relu: bool, tiles_per_img: int):
    i = pl.program_id(0)
    img = i // tiles_per_img
    row0 = (i % tiles_per_img) * tile_h  # top of this tile in padded coords
    cin = x_vmem.shape[-1]
    cout = out_ref.shape[-1]

    dma = pltpu.make_async_copy(
        x_hbm.at[img, pl.ds(row0, tile_h + 2), :, :],
        x_vmem,
        sem,
    )
    dma.start()
    dma.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            patch = x_vmem[dy : dy + tile_h, dx : dx + width, :]
            a = patch.reshape(tile_h * width, cin)
            acc_ref[:] += jnp.dot(a, w_ref[dy * 3 + dx],
                                  preferred_element_type=jnp.float32)
    y = acc_ref[:] + b_ref[0, :].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(1, tile_h, width, cout).astype(out_ref.dtype)


def _kernel_v2(x0, x1, x2, w_ref, b_ref, out_ref, acc_ref, *, relu: bool):
    """Shift-free variant: the three row-shifted copies of the padded input
    arrive as separate blocked inputs (x0=rows-1, x1=rows, x2=rows+1), each
    (1, tile_h, W+2, C); only lane-aligned full-width slices remain."""
    tile_h, wp2, cin = x0.shape[1], x0.shape[2], x0.shape[3]
    width = wp2 - 2
    cout = out_ref.shape[-1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy, xr in enumerate((x0, x1, x2)):
        for dx in range(3):
            patch = xr[0, :, dx : dx + width, :]
            a = patch.reshape(tile_h * width, cin)
            acc_ref[:] += jnp.dot(a, w_ref[dy * 3 + dx],
                                  preferred_element_type=jnp.float32)
    y = acc_ref[:] + b_ref[0, :].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(1, tile_h, width, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "tile_h"))
def conv3x3_bias_relu_v2(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
    tile_h: int = 16,
):
    """Crash-safe formulation of the fused conv: no manual DMA — XLA
    materializes three row-shifted views of the padded input and standard
    BlockSpecs stream non-overlapping (tile_h, W+2, C) blocks of each.
    Costs ~3× input HBM traffic vs the DMA version but uses only verified
    Mosaic pipelining.  Same signature/semantics as conv3x3_bias_relu."""
    n, h, w, cin0 = x.shape
    kh, kw, _, cout0 = kernel.shape
    assert (kh, kw) == (3, 3)
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be divisible by tile_h={tile_h}")
    cin = -(-cin0 // 128) * 128
    cout = -(-cout0 // 128) * 128
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin - cin0)))
    kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin - cin0), (0, cout - cout0)))
    bias = jnp.pad(bias, (0, cout - cout0))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (n, h+2, w+2, cin)
    shifted = [xp[:, dy : dy + h, :, :] for dy in range(3)]
    w9 = kernel.reshape(9, cin, cout).astype(x.dtype)
    tiles = h // tile_h

    def block_ix(i, t=tiles):
        return (i // t, i % t, 0, 0)

    xspec = pl.BlockSpec((1, tile_h, w + 2, cin), block_ix,
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, relu=relu),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=(n * tiles,),
        in_specs=[
            xspec, xspec, xspec,
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, cout), block_ix,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_h * w, cout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * cout * 9,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + kernel.size * 4 + n * h * w * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(shifted[0], shifted[1], shifted[2], w9, bias.reshape(1, cout))
    return out[..., :cout0]


@functools.partial(jax.jit, static_argnames=("relu", "tile_h"))
def conv3x3_bias_relu(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
    tile_h: int = 16,
):
    """x: (N, H, W, Cin); kernel: (3, 3, Cin, Cout); bias: (Cout,).
    'same' padding, stride 1.  H must be divisible by tile_h."""
    n, h, w, cin0 = x.shape
    kh, kw, _, cout0 = kernel.shape
    assert (kh, kw) == (3, 3), "kernel must be 3x3"
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be divisible by tile_h={tile_h}")
    # Mosaic DMA slices must be 128-lane aligned: pad channels to 128k.
    # (Zero input channels contribute nothing; extra output channels are
    # sliced off below.)
    cin = -(-cin0 // 128) * 128
    cout = -(-cout0 // 128) * 128
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin - cin0)))
    kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin - cin0), (0, cout - cout0)))
    bias = jnp.pad(bias, (0, cout - cout0))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = kernel.reshape(9, cin, cout).astype(x.dtype)
    tiles_per_img = h // tile_h
    grid = (n * tiles_per_img,)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=w, relu=relu,
                          tiles_per_img=tiles_per_img),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; DMA'd
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, cout),
            lambda i, t=tiles_per_img: (i // t, i % t, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w + 2, cin), x.dtype),
            pltpu.VMEM((tile_h * w, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * cout * 9,
            bytes_accessed=x.size * x.dtype.itemsize
            + kernel.size * 4 + n * h * w * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w9, bias.reshape(1, cout))
    return out[..., :cout0]
