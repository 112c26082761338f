"""XLA collectives — the framework's communication layer.

Replaces what NCCL/MPI would be in a GPU framework (the reference has
neither, SURVEY.md §2.3): inside ``shard_map``-ped functions these lower to
ICI collectives.

    psum_mean     gradient / metric all-reduce (DP)
    all_gather    eval-image collection across chips
    ppermute_shift neighbor exchange (halo rows for tiled inference)
"""

from __future__ import annotations

import jax
from jax import lax


def psum(x, axis_name: str = "data"):
    return lax.psum(x, axis_name)


def psum_mean(x, axis_name: str = "data"):
    return lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0, tiled: bool = True):
    return lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute_shift(x, axis_name: str, shift: int, wrap: bool = False):
    """Send each shard's ``x`` to the neighbor ``shift`` positions away.
    Non-wrapping by default (edges receive zeros) — the halo-exchange
    pattern; ``wrap=True`` gives the ring permutation."""
    n = lax.axis_size(axis_name)
    if wrap:
        perm = [(i, (i + shift) % n) for i in range(n)]
    else:
        perm = [(i, i + shift) for i in range(n) if 0 <= i + shift < n]
    return lax.ppermute(x, axis_name, perm)
