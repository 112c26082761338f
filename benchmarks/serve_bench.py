"""Concurrent serving load bench — mixed request shapes through the full
ServeState.enhance stack (decode → pad → jitted forward → u8 D2H → PNG).

VERDICT r2 #7: the 4.3× micro-batching receipt was same-shape only; this
bench drives a mixed-size load (default 256²/320²/512², ``bucket_divisor``
on) at a given concurrency and reports req/s + tail latency per shape.

The reference server (backend/app.py) is strictly batch-1 per request with
no shape bucketing — every new size pays a fresh torch CUDA graph/alloc.
Here, mixed sizes land in one compiled program per bucket and same-shape
concurrent requests coalesce into device batches (serve/batching.py).

Usage:  python benchmarks/serve_bench.py [--model dncnn] [--requests 96]
          [--concurrency 32] [--sizes 256,320,512] [--microbatch-ms 4]
Emits one JSON line (plus a per-size breakdown on stderr-style lines).
"""

import argparse
import concurrent.futures
import io
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from celebrity_image_denoiser_tpu.core import compile_cache  # noqa: E402


def make_png(rng, size: int) -> bytes:
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dncnn")
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--sizes", default="256,320,512")
    ap.add_argument("--microbatch-ms", type=float, default=4.0)
    ap.add_argument("--microbatch-max", type=int, default=16)
    ap.add_argument("--bucket-divisor", type=int, default=64)
    ap.add_argument("--weights-dir", default=None)
    ap.add_argument("--quantize", default="off", choices=["off", "int8"])
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    compile_cache.enable()
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir=args.weights_dir,
                    bucket_divisor=args.bucket_divisor,
                    microbatch_window_ms=args.microbatch_ms,
                    microbatch_max=args.microbatch_max,
                    quantize=None if args.quantize == "off"
                    else args.quantize)
    t0 = time.perf_counter()
    st.warmup(sizes=[(s, s) for s in sizes], models=[args.model])
    warm_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    pngs = {s: make_png(rng, s) for s in sizes}
    # one warm request per size (first PNG decode path, figure caches, etc.)
    for s in sizes:
        st.enhance(args.model, pngs[s], "image/png", include_graph=False)

    reqs = [sizes[i % len(sizes)] for i in range(args.requests)]
    rng.shuffle(reqs)
    lats = {s: [] for s in sizes}

    def one(size):
        t = time.perf_counter()
        st.enhance(args.model, pngs[size], "image/png", include_graph=False)
        return size, time.perf_counter() - t

    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(args.concurrency) as ex:
        for size, dt in ex.map(one, reqs):
            lats[size].append(dt)
    wall = time.perf_counter() - t0

    all_l = [x for v in lats.values() for x in v]
    out = {
        "bench": "serve_mixed_load", "model": args.model,
        "quantize": args.quantize,
        "sizes": sizes, "requests": args.requests,
        "concurrency": args.concurrency,
        "microbatch_ms": args.microbatch_ms,
        "bucket_divisor": args.bucket_divisor,
        "req_per_sec": round(args.requests / wall, 2),
        "warmup_s": round(warm_s, 1),
        "p50_ms": round(pct(all_l, 50) * 1e3, 1),
        "p95_ms": round(pct(all_l, 95) * 1e3, 1),
        "p99_ms": round(pct(all_l, 99) * 1e3, 1),
        "per_size_p50_ms": {str(s): round(pct(v, 50) * 1e3, 1)
                            for s, v in lats.items() if v},
        "batches": {k: v["batches"]
                    for k, v in (st.batchers.stats().items()
                                 if st.batchers else [])},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
