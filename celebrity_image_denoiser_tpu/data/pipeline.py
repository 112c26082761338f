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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.sharding = sharding
        self.num_threads = max(1, num_threads)
        self._epoch = 0

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

    def _load_batch(self, indices: Sequence[int]):
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
