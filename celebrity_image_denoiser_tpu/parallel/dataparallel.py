"""Data-parallel execution helpers.

Batched inference shards data-parallel across chips over ICI (the BASELINE
north star).  Training DP lives in train.gan_trainer (jit + NamedShardings;
XLA inserts the gradient psum); these helpers cover inference and utility
movement.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from celebrity_image_denoiser_tpu.parallel.mesh import batch_sharding, replicated


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch sharded over the mesh's data axis (dim 0 must be
    divisible by the axis size)."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate(tree: Any, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def data_parallel_apply(model, mesh: Mesh, axis: str = "data", train: bool = False):
    """jit a model forward with batch-sharded I/O and replicated params.

    Returns fn(params, state, x) -> y with x, y sharded over ``axis``;
    per-chip compute is the plain forward, XLA handles the (non-)communication
    — pure DP has no collective in the forward pass.
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, axis)

    def base(params, state, x):
        y, _ = model.apply(params, state, x, train=train)
        return y

    return jax.jit(base, in_shardings=(repl, repl, bsh), out_shardings=bsh)
