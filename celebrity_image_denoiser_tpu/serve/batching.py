"""Request micro-batching for serving throughput.

The reference serves strictly batch-1 forwards (one `net(x)` per request,
app.py:392/433) and its own frontend serializes requests "to manage GPU/CPU"
(page.tsx:123).  On a TPU that wastes almost the whole chip: the 128² U-Net
step costs ~2 ms at batch 1 but ~0.1 ms/image at batch 16+
(benchmarks/kernel_notes.md).  This module coalesces concurrent same-shape
requests into one device batch:

* requests enqueue per (model, padded shape) key; the thread that turns the
  queue non-empty becomes the *leader*, waits up to ``window_ms`` (returning
  immediately once a full batch accumulates), then drains everything that
  arrived and runs it as chunks of ``max_batch``;
* batches pad to the next power of two (1,2,4,8,…) so the jit cache holds
  O(log max_batch) programs per shape instead of one per occupancy;
* disabled by default (zero added latency); enable for load with
  ``ServeState(microbatch_window_ms=...)`` / ``cli.serve --microbatch-ms``.
"""

from __future__ import annotations

import contextlib
import threading
import time
from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp


def _pow2_at_least(n: int, cap: int) -> int:
    p = 1
    while p < n and p < cap:
        p *= 2
    return min(p, cap)


def default_fence(ys):
    """Fence AND fetch: return the finished batch as host numpy.

    JAX dispatch is asynchronous: without a fence the batcher returns in
    ~ms, no queue ever builds, and the coalescing window is the ONLY
    batching mechanism — measured at a 32-way mixed-shape load, batches ==
    requests (batch size 1 throughout).  Fencing the leader inside the
    in-flight slot creates backpressure: arrivals pile up in ``pending``
    while the device is busy and the next leader drains them as one batch,
    so the batch size adapts to the service time (continuous batching).

    The fence is ``device_get`` of the WHOLE batch, not a scalar probe:
    a scalar needs its own slice program (one XLA compile per batched
    shape — measured 100+ s runtime stalls over the tunnel), while the
    batch bytes are exactly what the n waiters were about to fetch as n
    separate slice transfers anyway; one bulk D2H is strictly cheaper on
    a 25 MB/s link, and waiters then slice numpy for free.
    ``block_until_ready`` alone is not a barrier on the tunneled axon
    backend (bench.py / CLAUDE.md)."""
    import jax
    import numpy as np

    try:
        return np.asarray(jax.device_get(ys))
    except (AttributeError, TypeError):  # non-array fn result (tests/mocks)
        return ys


class MicroBatcher:
    """Coalesce concurrent single-image forwards into device batches.

    ``fn(x)`` must be batch-polymorphic over axis 0 and per-sample
    independent (true for every inference forward here: convs/BN in eval
    mode).  Call with x of shape (1, H, W, C); returns (1, ...)."""

    def __init__(self, fn: Callable, window_ms: float = 3.0,
                 max_batch: int = 16,
                 slot: Optional[threading.Semaphore] = None,
                 fence: Optional[Callable] = None):
        # validate up front: a failing leader must never be possible for
        # config reasons — waiters block deadline-free on its finally-block
        if not (window_ms >= 0):
            raise ValueError(f"window_ms must be >= 0, got {window_ms}")
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.fn = fn
        self.window_s = window_ms / 1e3
        self.max_batch = max_batch
        # ``slot``: a semaphore bounding in-flight device batches, shared
        # across the pool (the device runs one program at a time anyway);
        # ``fence`` blocks on completion inside the slot.  Together they
        # create the backpressure that makes batch size adapt to load —
        # without them dispatch is async and every batch is size ~1 (see
        # default_fence).  The leader acquires the slot BEFORE draining, so
        # everything that arrived while the previous batch executed lands
        # in its batch.
        self.slot = slot
        self.fence = fence
        self.lock = threading.Lock()
        self.pending = []  # list of dicts: {x, ev, y|err}
        self._full = threading.Event()  # set when a full batch is waiting
        self.batches_run = 0  # observability / tests
        self.requests_served = 0

    def __call__(self, x):
        box = {"x": x, "ev": threading.Event()}
        with self.lock:
            self.pending.append(box)
            leader = len(self.pending) == 1
            if len(self.pending) >= self.max_batch:
                self._full.set()
        if leader:
            batch = []
            try:
                # wait up to the window, but dispatch immediately once a
                # full batch has accumulated (no dead time at saturation);
                # then take a device slot BEFORE draining — while a prior
                # batch executes, arrivals keep landing in pending and all
                # of them ride this leader's batch once the slot frees
                self._full.wait(self.window_s)
                with self.slot or contextlib.nullcontext():
                    with self.lock:
                        batch = self.pending
                        self.pending = []
                        self._full.clear()
                    self._run(batch)
            except BaseException as e:
                # a leader failure outside _run's per-chunk handling must
                # not strand waiters: fail everything this leader was
                # responsible for (its drained batch, or — if it crashed
                # before draining — the still-pending epoch).  Exception
                # path ONLY: in normal flow a successor leader may already
                # own the new pending list.
                with self.lock:
                    stranded = batch or self.pending
                    if not batch:
                        self.pending = []
                    self._full.clear()
                for b in stranded:
                    if not b["ev"].is_set():
                        b["err"] = e
                        b["ev"].set()
                raise
        # no timeout for followers: the leader's try/finally always sets
        # every event, and a compile for a new padded-batch shape can
        # legitimately take minutes on a tunneled backend — a deadline here
        # would turn that into spurious 500s for work that completes
        box["ev"].wait()
        if "err" in box:
            raise box["err"]
        return box["y"]

    def _run(self, batch):
        for start in range(0, len(batch), self.max_batch):
            chunk = batch[start:start + self.max_batch]
            try:
                n = len(chunk)
                padded = _pow2_at_least(n, self.max_batch)
                xs = jnp.concatenate(
                    [b["x"] for b in chunk]
                    + [chunk[-1]["x"]] * (padded - n), axis=0)
                ys = self.fn(xs)
                if self.fence is not None:
                    ys = self.fence(ys)  # fence + bulk D2H (host numpy)
                with self.lock:
                    self.batches_run += 1
                    self.requests_served += n
                for i, b in enumerate(chunk):
                    b["y"] = ys[i:i + 1]
            except Exception as e:  # fail THIS chunk's waiters only —
                # earlier chunks' results are already computed and valid
                for b in chunk:
                    b["err"] = e
            finally:
                for b in chunk:
                    # a BaseException inside fn (KeyboardInterrupt/
                    # SystemExit) skips the except above; waiters woken
                    # with neither 'y' nor 'err' would KeyError — mark
                    # them failed before setting the event (the leader's
                    # outer handler skips already-set waiters)
                    if "y" not in b and "err" not in b:
                        b["err"] = RuntimeError(
                            "micro-batch chunk aborted by BaseException "
                            "in the batched forward")
                    b["ev"].set()


class BatcherPool:
    """One MicroBatcher per (model, input shape) key.

    All batchers share one in-flight slot (``max_inflight`` device batches
    at a time, default 2: one executing + one dispatching hides the tunnel
    RTT without destroying the backpressure that lets batches build)."""

    def __init__(self, window_ms: float, max_batch: int = 16,
                 max_inflight: int = 2):
        # validate at construction (server startup), not on the first
        # request — a per-request ValueError would be swallowed into
        # perpetual 500s by the handler's catch-all
        if not (window_ms >= 0):
            raise ValueError(f"window_ms must be >= 0, got {window_ms}")
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        if max_inflight < 1:
            raise ValueError(f"max_inflight must be >= 1, got {max_inflight}")
        self.window_ms = window_ms
        self.max_batch = max_batch
        self._slot = threading.BoundedSemaphore(max_inflight)
        self._lock = threading.Lock()
        self._batchers: Dict[Tuple, MicroBatcher] = {}

    def get(self, key: Tuple, fn: Callable) -> MicroBatcher:
        with self._lock:
            b = self._batchers.get(key)
            if b is None:
                b = self._batchers[key] = MicroBatcher(
                    fn, self.window_ms, self.max_batch,
                    slot=self._slot, fence=default_fence)
            return b

    def stats(self) -> dict:
        with self._lock:
            return {
                str(k): {"batches": b.batches_run,
                         "requests": b.requests_served}
                for k, b in self._batchers.items()
            }
