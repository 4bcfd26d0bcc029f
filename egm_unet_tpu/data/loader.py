"""Host-side batch loader with background prefetch.

The reference uses torch DataLoader with worker processes
(ref: train.py:96-108); here a thread pool maps the (numpy) dataset and a
single-slot prefetch queue overlaps host IO/augmentation with device steps.
Train batches are static-shape (480x480 crops) so XLA compiles once.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, num_workers: int = 4,
                 collate=None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)
        self.collate = collate

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else (n + self.bs - 1) // self.bs

    def _assemble(self, idxs):
        samples = list(self.pool.map(self.ds.__getitem__, idxs))
        images = [s[0] for s in samples]
        targets = [s[1] for s in samples]
        if self.collate is not None:
            return self.collate(images, targets)
        return np.stack(images), np.stack(targets)

    def __iter__(self) -> Iterator:
        order = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=2)

        def producer():
            for b in range(nb):
                idxs = order[b * self.bs : (b + 1) * self.bs]
                q.put(self._assemble(idxs))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


class DevicePrefetcher:
    """Iterator adaptor that runs the host→device transfer one batch ahead.

    On a tunneled/remote TPU the H2D copy has high latency (the round-3
    training proof measured ~0.9 s/step of transfer against a 0.29 s
    compute step at bs 8, 480²) and JAX's async dispatch does not overlap
    it: ``device_put`` blocks the Python thread while the device computes
    asynchronously.  A worker thread applies ``prepare`` (dtype narrowing
    + ``jax.device_put`` / ``shard_batch``) to batch N+1 while the main
    thread's step N is in flight, hiding min(transfer, compute) per step.

    This replaces the overlap the reference gets for free from torch
    DataLoader's pinned-memory + synchronous-CUDA-copy pattern
    (ref: train.py:96-108) with one designed for a remote device.

    ``depth`` bounds in-flight device batches (depth 2 ≈ one extra batch
    resident in HBM).
    """

    def __init__(self, iterable, prepare, depth: int = 2):
        self.iterable = iterable
        self.prepare = prepare
        self.depth = depth

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = object()

        def worker():
            try:
                for batch in self.iterable:
                    q.put(self.prepare(batch))
            except BaseException as e:  # surface in the consumer thread
                q.put((stop, e))
                return
            q.put((stop, None))

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
                if item[1] is not None:
                    raise item[1]
                return
            yield item


def narrow_for_transfer(images: np.ndarray, targets: np.ndarray,
                        dtype) -> tuple[np.ndarray, np.ndarray]:
    """Narrow a host batch to minimal wire dtypes before ``device_put``.

    Images go over as the compute dtype (bf16 halves the bytes vs f32 —
    ``ml_dtypes`` gives numpy the dtype so the cast runs on host); integer
    masks go as uint8 (class ids and the 255 ignore value both fit) and
    are widened on device where the cast is free.  30 MB/step → 13 MB at
    bs 8, 480²."""
    import jax.numpy as jnp
    import ml_dtypes

    if images.dtype == np.uint8:
        pass  # raw wire_uint8 crops: normalized on device, 1 byte/px
    elif dtype == jnp.bfloat16:
        images = np.asarray(images, ml_dtypes.bfloat16)
    else:
        images = np.asarray(images, np.float32)
    if np.issubdtype(np.asarray(targets).dtype, np.integer):
        targets = np.asarray(targets, np.uint8)
    return images, targets


class SuperBatcher:
    """Group K consecutive loader batches into stacked ``(K, B, ...)``
    arrays for multi-step scan dispatch (``engine.make_train_multistep``).

    A trailing group smaller than K is emitted as-is (the multi-step jit
    compiles once per distinct K — at most two shapes per epoch length).
    """

    def __init__(self, loader, k: int):
        self.loader, self.k = loader, k

    def __len__(self):
        return -(-len(self.loader) // self.k)

    def __iter__(self) -> Iterator:
        buf = []
        for b in self.loader:
            buf.append(b)
            if len(buf) == self.k:
                yield tuple(np.stack(x) for x in zip(*buf))
                buf = []
        if buf:
            yield tuple(np.stack(x) for x in zip(*buf))
