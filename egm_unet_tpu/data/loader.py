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
