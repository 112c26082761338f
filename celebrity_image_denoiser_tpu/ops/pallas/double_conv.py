"""Fused U-Net double-conv block: conv3×3+bias+ReLU → conv3×3+bias+ReLU in
ONE Pallas kernel (the enc/dec block of models/denoise_unet.py, reference
app.py:43-77 — every U-Net level is exactly this pair).

Motivation (VERDICT r1 stretch): XLA runs the pair as two conv programs with
the intermediate activation round-tripping HBM; at C=64 the per-conv MXU
contraction (K=64) also wastes half the 128-wide systolic dimension.  This
kernel
* keeps the intermediate in VMEM (zero HBM traffic for it, ReLUs fused),
* reads the input ~2× (two row-shifted streams) vs the single-conv v2
  formulation's 3×,
* optionally packs the nine shift-matmuls of each conv into ONE MXU
  contraction over K=9·C (``kpack=True``): lane-concat of the shifted
  patches against the (9·C_in, C_out) reshaped kernel — K=576 for C=64,
  ~90% systolic utilization vs ~50% at K=64.  ``kpack=2`` packs ONLY
  conv2: at image-side C0 (padded 3→8) Mosaic crashes compiling the
  72-lane conv1 concat (r4 receipts), and conv1 is ~1/8 of the pair's
  FLOPs anyway — shift-dots for conv1, one K=9·C1 contraction for conv2.

Formulation rules follow conv_fused.py v2 (benchmarks/kernel_notes.md): no
manual HBM DMA (the v1 manual-DMA kernel faults this environment's tunneled
v5e worker) — only standard BlockSpec streaming of two row-shifted copies of
the padded input, VMEM-internal slicing, and MXU dots.  Policy stays
receipts-or-XLA: production dispatch remains lax.conv_general_dilated unless
the on-chip receipt says otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xa, xb, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            xbuf, h_ref, acc1, acc2, *, tile_h: int, width: int,
            kpack: bool, tiles: int):
    """xa/xb: (1, tile_h, W+4, C0) row-shifted blocks (rows r0 / r0+4 of the
    (+2,+2)-padded input) — together they cover the tile_h+4 rows this tile's
    double-halo needs.  All convs valid-slide inside VMEM."""
    c0 = xa.shape[-1]
    c1 = h_ref.shape[-1]
    c2 = out_ref.shape[-1]
    hh = tile_h + 2          # intermediate rows (1-px halo for conv2)
    ww = width + 2

    # assemble the (tile_h+4, W+4, C0) window from the two shifted streams
    xbuf[0:tile_h] = xa[0]
    xbuf[tile_h:tile_h + 4] = xb[0, tile_h - 4:tile_h]

    pack1 = kpack in (True, 1)
    pack2 = kpack in (True, 1, 2)
    # ---- conv1 + bias + ReLU -> h (hh, ww, C1), halo'd for conv2 ----------
    if pack1:
        a = jnp.concatenate(
            [xbuf[dy:dy + hh, dx:dx + ww, :].reshape(hh * ww, c0)
             for dy in range(3) for dx in range(3)], axis=-1)
        acc1[:] = jnp.dot(a, w1_ref[:], preferred_element_type=jnp.float32)
    else:
        acc1[:] = jnp.zeros_like(acc1)
        for dy in range(3):
            for dx in range(3):
                a = xbuf[dy:dy + hh, dx:dx + ww, :].reshape(hh * ww, c0)
                acc1[:] += jnp.dot(a, w1_ref[pl.ds((dy * 3 + dx) * c0, c0)],
                                   preferred_element_type=jnp.float32)
    h = jnp.maximum(acc1[:] + b1_ref[0, :].astype(jnp.float32), 0.0)
    # conv2's 'same' zero padding: h positions beyond the true image edge
    # must be 0, not "conv1 evaluated past the edge" (bias+ReLU make those
    # nonzero).  h[i, j] is conv1's output at row r0+i-1, col j-1; invalid
    # at j∈{0, ww-1} always (no column tiling) and at the first/last row
    # tile's outer i.
    t = pl.program_id(0) % tiles
    # build the mask directly at (hh*ww, 1): Mosaic can't shape-cast a 2D
    # (hh, ww) i1 vector to (hh*ww, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (hh * ww, 1), 0)
    row_ids = idx // ww
    col_ids = jax.lax.rem(idx, ww)
    valid = (col_ids >= 1) & (col_ids <= ww - 2)
    valid &= (row_ids >= 1) | (t > 0)
    valid &= (row_ids <= hh - 2) | (t < tiles - 1)
    h = h * valid.astype(h.dtype)
    h_ref[:] = h.reshape(hh, ww, c1).astype(h_ref.dtype)

    # ---- conv2 + bias + ReLU -> out (tile_h, W, C2) ------------------------
    if pack2:
        a = jnp.concatenate(
            [h_ref[dy:dy + tile_h, dx:dx + width, :].reshape(
                tile_h * width, c1)
             for dy in range(3) for dx in range(3)], axis=-1)
        acc2[:] = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    else:
        acc2[:] = jnp.zeros_like(acc2)
        for dy in range(3):
            for dx in range(3):
                a = h_ref[dy:dy + tile_h, dx:dx + width, :].reshape(
                    tile_h * width, c1)
                acc2[:] += jnp.dot(a, w2_ref[pl.ds((dy * 3 + dx) * c1, c1)],
                                   preferred_element_type=jnp.float32)
    y = jnp.maximum(acc2[:] + b2_ref[0, :].astype(jnp.float32), 0.0)
    out_ref[:] = y.reshape(1, tile_h, width, c2).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "kpack", "interpret"))
def double_conv3x3_relu(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    *,
    tile_h: int = 16,
    kpack: int = True,  # False/0: shift-dots; True/1: pack both convs; 2: pack conv2 only
    interpret: bool = False,
):
    """relu(conv3x3(relu(conv3x3(x) + b1)) + b2), both 'same', one kernel.

    x: (N, H, W, C0); w1: (3,3,C0,C1); w2: (3,3,C1,C2).  H % tile_h == 0.
    """
    n, h, w, c0 = x.shape
    assert w1.shape[:2] == (3, 3) and w2.shape[:2] == (3, 3)
    c1, c2 = w1.shape[3], w2.shape[3]
    assert w1.shape[2] == c0 and w2.shape[2] == c1
    if h % tile_h != 0:
        raise ValueError(f"H={h} must be divisible by tile_h={tile_h}")
    if c0 < 8:
        # image-side first layer (C0=3): Mosaic's lane tiling chokes on a
        # 3-wide minor dimension (the compiled kernel crashes the compile
        # helper); zero-pad input + the kernel's C_in rows to 8 — zeros
        # contribute nothing, and the padded input read is still tiny next
        # to the intermediate traffic this kernel exists to remove.
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 8 - c0)))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, 8 - c0), (0, 0)))
        c0 = 8
        if kpack in (True, 1):
            # packing conv1 at padded image-side widths emits a 72-lane
            # concat that crashes Mosaic on the real v5e (r4 receipts, and
            # a wedge hazard per CLAUDE.md) — demote to conv2-only packing;
            # conv1 is ~1/8 of the pair's FLOPs, so nothing is lost.
            kpack = 2
    # double-halo padding: 2 rows/cols each side (1 per conv)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xa = xp[:, 0:h, :, :]        # rows r .. r+tile_h      of each tile
    xb = xp[:, 4:h + 4, :, :]    # rows r+4 .. r+tile_h+4  (the +4 tail)
    w1f = w1.reshape(9 * c0, c1).astype(x.dtype)
    w2f = w2.reshape(9 * c1, c2).astype(x.dtype)
    tiles = h // tile_h

    def block_ix(i, t=tiles):
        return (i // t, i % t, 0, 0)

    xspec = pl.BlockSpec((1, tile_h, w + 4, c0), block_ix,
                         memory_space=pltpu.VMEM)
    hh, ww = tile_h + 2, w + 2
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=w, kpack=kpack,
                          tiles=tiles),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c2), x.dtype),
        grid=(n * tiles,),
        in_specs=[
            xspec, xspec,
            pl.BlockSpec((9 * c0, c1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c2), block_ix,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 4, w + 4, c0), x.dtype),   # window
            pltpu.VMEM((hh, ww, c1), x.dtype),              # intermediate
            pltpu.VMEM((hh * ww, c1), jnp.float32),         # acc conv1
            pltpu.VMEM((tile_h * w, c2), jnp.float32),      # acc conv2
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 9 * (hh * ww * c0 * c1 + h * w * c1 * c2),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1f.size + w2f.size) * x.dtype.itemsize
            + n * h * w * c2 * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xa, xb, w1f, b1.reshape(1, c1), w2f, b2.reshape(1, c2))
    return out
