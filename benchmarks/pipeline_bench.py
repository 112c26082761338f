"""BASELINE config-2 benchmark: decode + resize + normalize + denoise,
batch-64 at 128×128 — the end-to-end batched pipeline.

Host stage (PIL decode → C++ resize/normalize/assembly) and device stage
(U-Net forward) are measured separately and overlapped; prints a JSON line
per stage plus the overlapped end-to-end rate.  (bench.py remains the
headline single-metric harness.)
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

# runnable straight from a source checkout (python benchmarks/pipeline_bench.py)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "celebrity_image_denoiser_tpu")):
    sys.path.insert(0, _REPO)


def make_jpegs(n: int, hw=(178, 218)) -> list:
    """Synthesize a CelebA-like JPEG set on disk."""
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    d = tempfile.mkdtemp(prefix="cid_bench_jpeg_")
    for i in range(n):
        arr = rng.integers(0, 256, (hw[1], hw[0], 3), dtype=np.uint8)
        p = os.path.join(d, f"{i:04d}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def bench_host_stage(paths, batch=64, out_hw=(128, 128), iters=8):
    from celebrity_image_denoiser_tpu.data import imageio, native

    t0 = time.perf_counter()
    n = 0
    for it in range(iters):
        sel = [paths[(it * batch + i) % len(paths)] for i in range(batch)]
        decoded = [imageio.imread_rgb(p) for p in sel]  # PIL decode
        if native.available():
            native.assemble_batch(decoded, out_hw, mean=0.5, std=0.5)
        else:
            np.stack([
                (np.asarray(
                    __import__("PIL.Image", fromlist=["Image"]).Image
                    .fromarray(d).resize(out_hw), np.float32) / 255 - .5) / .5
                for d in decoded])
        n += batch
    dt = time.perf_counter() - t0
    return n / dt


def bench_train_path(paths, batch=64, out_hw=(128, 128), threads=(1, 2, 4, 8)):
    """Host throughput of THE pipeline the trainer iterates (DataPipeline ->
    dataset.raw decode threads -> C++ cid_assemble_batch), per thread count.
    Same code path as cli/train (no device stage: sharding=None + numpy-only
    consumption measures pure host assembly + device_put dispatch)."""
    import shutil
    import tempfile as _tf

    from celebrity_image_denoiser_tpu.data.datasets import CleanImageDataset
    from celebrity_image_denoiser_tpu.data.pipeline import DataPipeline

    d = _tf.mkdtemp(prefix="cid_bench_tree_")
    os.makedirs(os.path.join(d, "p0"))
    for i, p in enumerate(paths):
        os.link(p, os.path.join(d, "p0", f"{i:04d}.jpg"))
    ds = CleanImageDataset(d, image_size=out_hw, normalize=True,
                           test_split=0.01)
    rates = {}
    for nt in threads:
        pipe = DataPipeline(ds, batch, shuffle=False, num_threads=nt,
                            prefetch=2)
        for _ in pipe:  # warm a FULL epoch: an abandoned iterator would
            pass        # leak its producer thread into the timed runs
        t0 = time.perf_counter()
        n = 0
        while n < 4 * batch:  # several epochs of the small corpus
            for b in pipe:
                n += b.shape[0]
        dt = time.perf_counter() - t0
        rates[nt] = n / dt
    shutil.rmtree(d)
    return rates, pipe.use_native


def bench_device_stage(batch=64, out_hw=(128, 128), iters=15):
    import jax
    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core import prng

    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))

    @jax.jit
    def step(x):
        y, _ = model.apply(params, state, x.astype(jnp.bfloat16), train=False)
        return y

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(-1, 1, (batch, *out_hw, 3)).astype(np.float32))

    def fence(y):
        np.asarray(jax.device_get(y[0, 0, 0, 0]))

    fence(step(x))
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        cur = step(cur.astype(jnp.float32))
    fence(cur)
    dt = time.perf_counter() - t0
    return iters * batch / dt


def main():
    paths = make_jpegs(128)
    host_rate = bench_host_stage(paths)
    print(json.dumps({"metric": "host_decode_resize_normalize_assemble",
                      "value": round(host_rate, 1), "unit": "images/sec"}))
    rates, used_native = bench_train_path(paths)
    for nt, r in rates.items():
        print(json.dumps({
            "metric": f"train_pipeline_host_threads{nt}"
                      + ("" if used_native else "_python_fallback"),
            "value": round(r, 1), "unit": "images/sec"}))
    try:
        dev_rate = bench_device_stage()
        print(json.dumps({"metric": "device_denoise_batch64_128",
                          "value": round(dev_rate, 1), "unit": "images/sec"}))
        # stages overlap (pipeline.py): end-to-end ≈ min of the two rates
        print(json.dumps({"metric": "pipeline_end_to_end_overlapped",
                          "value": round(min(host_rate, dev_rate), 1),
                          "unit": "images/sec"}))
    except Exception as e:
        print(json.dumps({"metric": "device_denoise_batch64_128",
                          "value": None, "unit": f"unavailable: {e}"}))


if __name__ == "__main__":
    main()
