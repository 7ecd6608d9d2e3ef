"""Host-side batching loader with device prefetch.

Replaces torch DataLoader (ref: scripts/train.py:111-128): shuffling,
drop_last for training, NHWC numpy batch assembly and an overlap-friendly
single-step prefetch so the host stages batch N+1 while the device runs N.
"""

from __future__ import annotations

import collections
import concurrent.futures
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

Batch = Tuple[np.ndarray, np.ndarray, tuple]


class DataLoader:
    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Batch]:
        idx = self._indices()
        self._epoch += 1
        nb = len(self)
        # separate pools: item decode (io) vs batch prefetch (1 slot) —
        # a prefetch task mapping onto its own pool would self-deadlock
        # at num_workers=1
        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as io_pool, \
                concurrent.futures.ThreadPoolExecutor(1) as prefetch_pool:
            def load_batch(b):
                sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                items = list(io_pool.map(self.dataset.__getitem__, sel))
                imgs = np.stack([it[0] for it in items])
                masks = np.stack([it[1] for it in items])
                paths = tuple(it[2] for it in items)
                return imgs, masks, paths

            pending: Optional[concurrent.futures.Future] = None
            for b in range(nb):
                cur = load_batch(b) if pending is None else pending.result()
                pending = (prefetch_pool.submit(load_batch, b + 1)
                           if b + 1 < nb else None)
                yield cur


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Stage host batches onto device ahead of compute (images/masks only)."""
    queue = collections.deque()

    def _put(batch):
        imgs, masks, paths = batch
        if sharding is not None:
            imgs = jax.device_put(imgs, sharding)
            masks = jax.device_put(masks, sharding)
        else:
            imgs = jax.device_put(imgs)
            masks = jax.device_put(masks)
        queue.append((imgs, masks, paths))

    it = iter(iterator)
    try:
        for _ in range(size):
            _put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            _put(next(it))
        except StopIteration:
            pass
        yield out
