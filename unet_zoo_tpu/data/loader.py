"""Host-side batching loader with device prefetch.

Replaces torch DataLoader (ref: scripts/train.py:111-128): shuffling,
drop_last for training, NHWC numpy batch assembly and an overlap-friendly
single-step prefetch so the host stages batch N+1 while the device runs N.

Worker pools are created once per loader and reused across epochs (the
torch DataLoader with persistent_workers=True analogue) — rebuilding
pools every ``__iter__`` cost a thread spawn/join storm per epoch.

Item decode uses PROCESSES by default for ``num_workers > 1``: PIL's
PNG decode holds the GIL in this build, so thread pools showed ZERO
scaling (measured 88 img/s single-thread vs 84 img/s with 8 threads at
256px). Workers are spawned once with the pickled dataset installed via
an initializer (items aren't re-pickled per call); anything that fails
to pickle falls back to the thread pool.
"""

from __future__ import annotations

import collections
import concurrent.futures
import multiprocessing
import pickle
import weakref
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

Batch = Tuple[np.ndarray, np.ndarray, tuple]

_worker_dataset = None


def _proc_init(ds_bytes: bytes) -> None:
    global _worker_dataset
    _worker_dataset = pickle.loads(ds_bytes)
    # Each worker unpickles an identical dataset copy; decorrelate the
    # augmentation streams by folding the worker pid into the RNG seed
    # (otherwise every worker would emit the same flip sequence).
    import os

    rng = getattr(_worker_dataset, "_aug_rng", None)
    if rng is not None:
        _worker_dataset._aug_rng = np.random.default_rng(
            [os.getpid(), 0x5EED])


def _proc_get(index: int):
    return _worker_dataset[index]


class DataLoader:
    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 4,
                 use_processes: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        # None = auto: processes when >1 worker (GIL-bound PIL decode)
        self.use_processes = use_processes
        self._epoch = 0
        # persistent pools, lazily created on first iteration:
        # item decode (io) vs batch prefetch (1 slot) — a prefetch task
        # mapping onto its own pool would self-deadlock at num_workers=1
        self._io_pool = None
        self._io_get = None
        self._prefetch_pool: Optional[concurrent.futures.ThreadPoolExecutor] = None
        self._finalizer = None

    def _make_io_pool(self):
        if self.use_processes is not None:
            want_procs = self.use_processes
        else:
            # auto: processes need real cores to win; on a core-starved
            # host (e.g. this CI image has ONE core) IPC+context switches
            # make them slower than the in-process path
            try:
                import os

                cores = len(os.sched_getaffinity(0))
            except (AttributeError, OSError):  # pragma: no cover
                import os

                cores = os.cpu_count() or 1
            want_procs = self.num_workers > 1 and cores > 1
            if want_procs and getattr(self.dataset, "decoder", None) in (
                    "auto", "cpp"):
                # the C++ decode pipeline releases the GIL, so plain
                # threads scale across cores WITHOUT the process pool's
                # costs (pickled dataset per worker, per-worker decode
                # caches, spawn latency)
                from unet_zoo_tpu import native

                if native.available():
                    want_procs = False
        if want_procs:
            try:
                # NOTE: with cache=True every process worker builds its own
                # decoded cache (RAM x num_workers); caching is most useful
                # with the in-process thread pool (use_processes=False).
                ds_bytes = pickle.dumps(self.dataset)
                # spawn: never fork a process that may hold JAX/TPU state
                pool = concurrent.futures.ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=multiprocessing.get_context("spawn"),
                    initializer=_proc_init, initargs=(ds_bytes,))
                return pool, _proc_get
            except Exception:
                pass  # unpicklable dataset etc. → threads
        pool = concurrent.futures.ThreadPoolExecutor(
            self.num_workers, thread_name_prefix="uz-io")
        return pool, self.dataset.__getitem__

    def _pools(self):
        if self._io_pool is None:
            self._io_pool, self._io_get = self._make_io_pool()
            self._prefetch_pool = concurrent.futures.ThreadPoolExecutor(
                1, thread_name_prefix="uz-prefetch")
            self._finalizer = weakref.finalize(
                self, DataLoader._shutdown_pools,
                self._io_pool, self._prefetch_pool)
        return self._io_pool, self._prefetch_pool

    @staticmethod
    def _shutdown_pools(io_pool, prefetch_pool):
        io_pool.shutdown(wait=False, cancel_futures=True)
        prefetch_pool.shutdown(wait=False, cancel_futures=True)

    def close(self) -> None:
        """Release worker threads (also runs automatically on GC)."""
        if self._finalizer is not None:
            self._finalizer()
        self._io_pool = None
        self._prefetch_pool = None
        self._finalizer = None

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
        io_pool, prefetch_pool = self._pools()

        def load_batch(b):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            items = list(io_pool.map(self._io_get, [int(i) for i in sel]))
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
