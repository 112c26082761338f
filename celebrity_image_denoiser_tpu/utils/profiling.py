"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).
Here: jax.profiler traces (Perfetto/XPlane dumps), a step timer with
throughput accounting, and a debug mode that enables NaN checking
(jax_debug_nans) for fault isolation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax

from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.profiling")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cid_trace") -> Iterator[None]:
    """jax.profiler trace context; open the dump with Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """NaN-check mode: any NaN produced under jit raises with a traceback."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Wall-clock per-step timing with items/sec; fence-aware.

    On tunneled PJRT backends ``block_until_ready`` may not be a true
    barrier (see bench.py); pass a result array to ``stop`` and it fetches
    one element as the fence.
    """

    def __init__(self):
        self.history: list = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, fence_array=None, items: int = 0) -> float:
        if fence_array is not None:
            import numpy as np

            np.asarray(jax.device_get(jax.tree.leaves(fence_array)[0]).ravel()[0])
        dt = time.perf_counter() - self._t0
        self.history.append((dt, items))
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.history:
            return {}
        total = sum(t for t, _ in self.history)
        items = sum(n for _, n in self.history)
        return {
            "steps": len(self.history),
            "total_s": total,
            "mean_ms": total / len(self.history) * 1e3,
            "items_per_s": items / total if total else 0.0,
        }
