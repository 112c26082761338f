"""In-process serving metrics for the `/stats` and `/healthz` routes.

Framework addition (the reference backend has no observability surface at
all — its only signals are uvicorn access logs, backend/app.py): per-model
request counters, error counts, latency quantiles over a sliding window,
and compute-backend routing counts (int8/float × plain/tiled/sharded — the
`compute=` field of the per-request stage-timing log line, aggregated).

Thread-safe: the stdlib server handles each request on its own thread and
the FastAPI variant uses a threadpool, so all mutation happens under one
lock.  Latencies keep a bounded deque per model (last ``window`` requests)
— O(1) memory, and quantiles over the recent window are what an operator
actually wants on a long-lived process.
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Dict


class ServeStats:
    def __init__(self, window: int = 512):
        self._lock = threading.Lock()
        self._t0 = time.time()
        self._window = window
        self._requests: Dict[str, int] = collections.defaultdict(int)
        self._errors: Dict[str, int] = collections.defaultdict(int)
        self._latency: Dict[str, collections.deque] = {}
        self._backends: Dict[str, int] = collections.defaultdict(int)

    def record(self, model: str, latency_s: float, backend: str) -> None:
        with self._lock:
            self._requests[model] += 1
            self._backends[backend] += 1
            dq = self._latency.get(model)
            if dq is None:
                dq = self._latency[model] = collections.deque(
                    maxlen=self._window)
            dq.append(latency_s)

    def record_error(self, model: str, status: int) -> None:
        with self._lock:
            self._errors[f"{model or 'unknown'}:{status}"] += 1

    @staticmethod
    def _quantile(sorted_vals, q: float) -> float:
        if not sorted_vals:
            return 0.0
        i = min(len(sorted_vals) - 1, int(q * len(sorted_vals)))
        return sorted_vals[i]

    def snapshot(self) -> dict:
        with self._lock:
            lat = {}
            for model, dq in self._latency.items():
                vals = sorted(dq)
                lat[model] = {
                    "window": len(vals),
                    "p50_ms": round(self._quantile(vals, 0.50) * 1e3, 1),
                    "p95_ms": round(self._quantile(vals, 0.95) * 1e3, 1),
                    "max_ms": round(vals[-1] * 1e3, 1) if vals else 0.0,
                }
            return {
                "uptime_s": round(time.time() - self._t0, 1),
                "requests": dict(self._requests),
                "errors": dict(self._errors),
                "latency": lat,
                "compute_backends": dict(self._backends),
            }
