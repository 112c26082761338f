"""Overlap-tiled high-resolution inference with halo exchange.

The reference's only large-input story is pad-to-divisor-4 then push the
whole padded image through the net at once (app.py:276-281,383-385), which
OOMs on large portraits.  The TPU-native replacement (BASELINE config 5):

* shard the image's **height** across the mesh's chips;
* each chip exchanges ``halo`` boundary rows with its immediate neighbors
  via ``ppermute`` over ICI (edge chips see zeros — identical to the
  zero-padding the full-image convolution would apply at the real border);
* each chip runs the generator on its (rows + 2·halo) strip and keeps the
  center rows.

Two implementations, trading communication for border exactness:

* ``spatial_sharded_apply`` — the **exact** path: jit the unmodified forward
  with the image height sharded over the mesh (GSPMD).  XLA inserts a halo
  ``collective-permute`` at every conv/pool layer (60 for the U-Net), and the
  result is bit-identical to the single-shot forward, borders included
  (asserted to 0.0 error in tests/test_parallel.py).
* ``tiled_apply`` — the **low-communication** path: ONE halo exchange of
  ``halo`` rows up front, then fully local compute.  Interior tile seams are
  bit-exact when halo ≥ the receptive-field radius (~28 px for the U-Net:
  3×3 stacks at strides 1/2/4 through the decoder; default halo 32, aligned
  to the pooling divisor 4).  Only the image's outer ≤radius border band
  deviates slightly from single-shot (the zero-filled halo differs from
  per-layer implicit padding after the first bias+ReLU) — no visible seams,
  1/60th the collective rounds.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from celebrity_image_denoiser_tpu.core.config import get_padding


def _exchange_halos(x_local: jax.Array, halo: int, axis_name: str):
    """x_local: (N, h_loc, W, C) on each chip.  Returns (N, h_loc+2*halo, W, C)
    with true neighbor rows (zeros at the outer edges)."""
    n = lax.axis_size(axis_name)
    # rows my lower neighbor needs (my bottom) travel +1; my top rows travel -1
    bottom_rows = x_local[:, -halo:, :, :]
    top_rows = x_local[:, :halo, :, :]
    if n == 1:
        from_above = jnp.zeros_like(top_rows)
        from_below = jnp.zeros_like(bottom_rows)
    else:
        perm_down = [(i, i + 1) for i in range(n - 1)]
        perm_up = [(i, i - 1) for i in range(1, n)]
        # chips that receive nothing get zeros (jax ppermute semantics)
        from_above = lax.ppermute(bottom_rows, axis_name, perm_down)
        from_below = lax.ppermute(top_rows, axis_name, perm_up)
    return jnp.concatenate([from_above, x_local, from_below], axis=1)


def tiled_apply(
    model,
    params,
    state,
    mesh: Mesh,
    *,
    halo: int = 32,
    scale: int = 1,
    axis: str = "data",
):
    """Build fn(x) running ``model`` over height-sharded tiles.

    x: (N, H, W, C) with H divisible by (mesh_axis_size * 4); returns the
    stitched (N, H*scale, W*scale, C) output, seam-free when halo covers the
    receptive field.  ``scale`` is the model's spatial scale factor (4 for
    SRGAN ×4; halo rows scale accordingly on the output side).
    """
    if halo % 4 != 0:
        raise ValueError(f"halo must be divisible by 4 (pooling alignment), got {halo}")
    n_shards = mesh.shape[axis]

    def per_shard(params, state, x_local):
        x_ext = _exchange_halos(x_local, halo, axis)
        y_ext, _ = model.apply(params, state, x_ext, train=False)
        return y_ext[:, halo * scale : y_ext.shape[1] - halo * scale, :, :]

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )

    @jax.jit
    def fn(x):
        h = x.shape[1]
        if h % (n_shards * 4) != 0:
            raise ValueError(
                f"height {h} must be divisible by n_shards*4={n_shards * 4}"
            )
        if h // n_shards < halo:
            raise ValueError(
                f"per-shard strip {h // n_shards} < halo {halo}: "
                f"use fewer shards or a smaller halo"
            )
        return sharded(params, state, x)

    return fn


def spatial_sharded_apply(
    model,
    mesh: Mesh,
    *,
    axis: str = "data",
    train: bool = False,
    spatial_dim: int = 1,
    apply_fn=None,
):
    """Exact multi-chip tiled inference via GSPMD spatial partitioning.

    Returns fn(params, state, x) with x (N, H, W, C) sharded along
    ``spatial_dim`` (1=height, 2=width; both for a 2-D mesh by calling with
    a tuple axis) over the mesh axis; XLA propagates the spatial sharding
    through every conv/pool, inserting per-layer halo exchanges over ICI.
    Output is bit-identical to the single-device forward.  The sharded
    extent must be divisible by the axis size.

    ``apply_fn(params, state, x) -> y`` substitutes the forward — the int8
    serving path passes its quantized apply (round/clip are elementwise and
    the int8 conv partitions spatially like any conv, so GSPMD sharding
    stays bit-exact vs the single-device quantized forward:
    test_quantized_sharded_matches_single_device_int8).  Its baked int8
    weight constants replicate per chip, same as float params do."""
    if spatial_dim not in (1, 2):
        raise ValueError(f"spatial_dim must be 1 (height) or 2 (width), "
                         f"got {spatial_dim}")
    repl = NamedSharding(mesh, P())
    spec = [None, None, None, None]
    spec[spatial_dim] = axis
    hsh = NamedSharding(mesh, P(*spec))

    if apply_fn is None:
        def apply_fn(params, state, x):
            y, _ = model.apply(params, state, x, train=train)
            return y

    return jax.jit(apply_fn, in_shardings=(repl, repl, hsh),
                   out_shardings=hsh)


def tiled_apply_single_device(
    model, params, state, *, tile_h: int = 256, halo: int = 32,
    scale: int = 1, apply_fn=None, axis: int = 1,
):
    """Sequential tiled inference on one device — serving arbitrary-size
    images under a VMEM/HBM budget without multi-chip.

    **Exact**: edge tiles end at the true image border (the model applies its
    own implicit padding there, identical to the single-shot forward), and
    interior tile boundaries carry ``halo`` rows of true context.  Bit-equal
    to the full forward when halo ≥ receptive radius; at most three distinct
    tile shapes compile (first/middle/last).

    ``apply_fn(params, state, x) -> y`` substitutes the per-tile forward —
    the int8 serving path passes its quantized apply here (tile shapes are
    static, so the calibrated scales replay per tile exactly as they do on
    the full image; VERDICT r3 next #7).  Default: ``model.apply`` in eval
    mode.

    ``axis``: 1 tiles the height (default), 2 the width — a very WIDE
    image needs width tiles, since height tiles would still span the full
    width.  For images oversized on BOTH axes, pass a width-tiler as this
    tiler's ``apply_fn`` (the nested python loop traces into the per-H-tile
    program; serving's both-axes route does exactly that).

    The tiled extent and ``tile_h`` must be divisible by 4 (serving pads to
    the model divisor first, core.config.get_padding)."""
    if halo % 4 != 0 or tile_h % 4 != 0:
        raise ValueError("halo and tile_h must be divisible by 4")
    if axis not in (1, 2):
        raise ValueError(f"axis must be 1 (height) or 2 (width), got {axis}")
    if apply_fn is None:
        def apply_fn(p, s, x):
            y, _ = model.apply(p, s, x, train=False)
            return y

    # one jitted program per (tile shape, crop window): slice + forward +
    # center-crop fused into a single device call.  jit's cache keys on the
    # static args, so at most three distinct programs compile
    # (first/middle/last tile shapes) — an eager per-tile model.apply would
    # pay op-by-op dispatch per layer per tile, which on a tunneled backend
    # costs more than the compute (benchmarks/kernel_notes.md).
    @partial(jax.jit, static_argnums=(4, 5, 6))
    def tile_fwd(params, state, x, lo, size, keep_lo, keep_len):
        # dynamic offset + STATIC extent: every interior tile shares one
        # compiled program regardless of its position in the image
        tile = lax.dynamic_slice_in_dim(x, lo, size, axis=axis)
        y = apply_fn(params, state, tile)
        return lax.slice_in_dim(y, keep_lo, keep_lo + keep_len, axis=axis)

    def fn(x: jax.Array) -> jax.Array:
        h = x.shape[axis]
        if h % 4 != 0:
            raise ValueError(
                f"axis-{axis} extent {h} must be divisible by 4 (pad first)")
        outs = []
        for start in range(0, h, tile_h):
            stop = min(start + tile_h, h)
            lo = max(start - halo, 0)
            hi = min(stop + halo, h)
            outs.append(tile_fwd(params, state, x, lo, hi - lo,
                                 (start - lo) * scale,
                                 (stop - start) * scale))
        return jnp.concatenate(outs, axis=axis)

    return fn
