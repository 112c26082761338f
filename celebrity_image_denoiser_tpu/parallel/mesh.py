"""Device mesh setup.

The reference has no distributed execution at all (SURVEY.md §2.3 — single
``cuda``/``cpu`` device, app.py:33).  This module is the communication
layer's foundation for the TPU build: a ``jax.sharding.Mesh`` over ICI
(one axis, ``data``, for the DP workloads here; multi-axis meshes — e.g.
("replica", "data") across DCN slices — are supported by passing a shape).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Mesh over all (or the given) devices.  Default: 1-D ``data`` axis
    across every chip — gradient psum and batch sharding ride ICI."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the given mesh axis."""
    return NamedSharding(mesh, P(axis))
