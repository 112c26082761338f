"""Host→device input pipeline with prefetch overlap.

TPU-native replacement for torch ``DataLoader(num_workers=4, pin_memory)``
(reference training.py:252-260) and the tf.data cache/shuffle/prefetch chains
(sr_ganpreprocess.py:170-176): a background producer pool decodes and batches
on the host while ``jax.device_put`` stages the *next* batch onto the device
asynchronously (JAX transfers are async — dispatching the put for batch k+1
before batch k's step completes overlaps H2D DMA with compute).

With a ``jax.sharding.Sharding``, batches land pre-sharded across the data-
parallel mesh axis — the loader is the DP boundary, no per-chip slicing in
the step function.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import jax
import numpy as np

from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.data.pipeline")

_STOP = object()


class DataPipeline:
    """Iterates device-resident batches.

    dataset: indexable returning sample | (a, b, ...) | None (skipped).
    Batches are stacked numpy, then device_put (optionally with a sharding)
    into a bounded prefetch queue.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        num_threads: int = 2,
        use_native: Optional[bool] = None,
    ):
        """``use_native``: route batch assembly through the C++ stage
        (data/native.py: parallel PIL decode threads feed
        ``cid_assemble_batch``'s fused resize+normalize+assembly pool) when
        the dataset advertises a ``raw_batch_spec``.  Default (None) = auto:
        on when the native library builds.  The C++ bicubic matches PIL
        within ±2/255 mean (tests/test_native.py), not bit-exactly — pass
        False for bit-parity with the pure-python path."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        self.num_threads = max(1, num_threads)
        self._epoch = 0
        self._spec = getattr(dataset, "raw_batch_spec", None)
        from celebrity_image_denoiser_tpu.data import native

        if use_native is None:  # auto
            use_native = self._spec is not None and native.available()
        elif use_native:  # explicit request: fail fast, not mid-epoch
            if self._spec is None:
                raise ValueError(
                    "use_native=True but the dataset exposes no "
                    "raw_batch_spec (needs raw() + fixed sizes)")
            if not native.available():
                raise RuntimeError(
                    "use_native=True but the native C++ stage is not "
                    "available (data/_native build failed?)")
        self.use_native = bool(use_native and self._spec is not None)
        self._pool = None

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    # -- host-side batch assembly -------------------------------------------
    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _load_batch_native(self, indices: Sequence[int]):
        """Decode in parallel python threads (PIL releases the GIL for the
        codec work), then hand the uint8 images to the C++ stage for fused
        bicubic resize + normalize + NHWC assembly (loader.cpp) — the
        BASELINE config-2 host stage on the training path."""
        from concurrent.futures import ThreadPoolExecutor

        from celebrity_image_denoiser_tpu.data import native

        if self._pool is None:
            self._pool = ThreadPoolExecutor(self.num_threads)
        raws = [r for r in self._pool.map(
            lambda i: self.dataset.raw(int(i)), indices) if r is not None]
        if not raws:
            return None
        if self.drop_last and len(raws) < len(indices):
            k = 0
            while len(raws) < len(indices):  # static batch dim for XLA
                raws.append(raws[k % len(raws)])
                k += 1
        sides = []
        for j, (hw, mean, std) in enumerate(self._spec):
            imgs = [(r[j] if isinstance(r, tuple) else r) for r in raws]
            sides.append(native.assemble_batch(
                imgs, hw, mean=mean, std=std, threads=self.num_threads))
        return tuple(sides) if len(sides) > 1 else sides[0]

    def _load_batch(self, indices: Sequence[int]):
        if self.use_native:
            return self._load_batch_native(indices)
        samples = []
        for i in indices:
            s = self.dataset[int(i)]
            if s is not None:  # warn-and-skip: dataset already logged it
                samples.append(s)
        if not samples:
            return None
        if self.drop_last and len(samples) < len(indices):
            # keep the batch shape static for XLA: top up skipped slots by
            # repeating loaded samples (a varying batch dim would force a
            # recompile of the whole train step per unique size)
            k = 0
            while len(samples) < len(indices):
                samples.append(samples[k % len(samples)])
                k += 1
        if isinstance(samples[0], tuple):
            return tuple(np.stack([s[j] for s in samples]) for j in range(len(samples[0])))
        return np.stack(samples)

    def _put(self, batch):
        if batch is None:
            return None
        if self.sharding is not None:
            if isinstance(batch, tuple):
                return tuple(jax.device_put(b, self.sharding) for b in batch)
            return jax.device_put(batch, self.sharding)
        if isinstance(batch, tuple):
            return tuple(jax.device_put(b) for b in batch)
        return jax.device_put(batch)

    # -- iteration ------------------------------------------------------------
    def __iter__(self) -> Iterator:
        idx = self._indices()
        self._epoch += 1
        n = len(idx)
        bounds = []
        for start in range(0, n, self.batch_size):
            end = min(start + self.batch_size, n)
            if end - start < self.batch_size and self.drop_last:
                break
            bounds.append(idx[start:end])

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def producer():
            try:
                for b in bounds:
                    batch = self._load_batch(b)
                    if batch is None:
                        continue
                    # device_put here so H2D for batch k+1 overlaps step k
                    q.put(self._put(batch))
            except Exception as e:  # surfaced on the consumer side
                q.put(e)
            finally:
                q.put(_STOP)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _STOP:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()
