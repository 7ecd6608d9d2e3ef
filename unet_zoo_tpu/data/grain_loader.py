"""grain-backed host input pipeline (drop-in DataLoader alternative).

The north-star data module calls for a tf.data/grain host pipeline
feeding the jit'd step; this wraps Google's `grain` (deterministic,
checkpointable, multiprocess prefetching) around the same dataset
objects (`data/datasets.py`) and yields the exact batch contract of
`data.loader.DataLoader`: ``(images f32 [B,H,W,3], masks f32 [B,H,W,1],
paths tuple[str])``.

Each ``__iter__`` re-samples with a fresh epoch-folded seed (torch
DataLoader reshuffle semantics). ``worker_count > 0`` decodes in grain's
worker processes — the scaling path on real multi-core TPU-VM hosts;
this 1-core CI image measures best at 0 (in-process) just like the
native loader's thread fallback.

Select via YAML: ``data: {loader: grain}`` (default "native").
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

Batch = Tuple[np.ndarray, np.ndarray, tuple]


class GrainLoader:
    def __init__(self, dataset, batch_size: int = 4, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 num_workers: int = 0, **_ignored):
        # native-DataLoader kwargs it doesn't use (use_processes) are
        # accepted and ignored so the two classes are interchangeable
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Batch]:
        from grain import python as pg

        sampler = pg.IndexSampler(
            num_records=len(self.dataset),
            shard_options=pg.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + self._epoch,
        )
        self._epoch += 1
        loader = pg.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=[pg.Batch(self.batch_size,
                                 drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )
        for imgs, masks, paths in loader:
            yield (np.asarray(imgs, np.float32),
                   np.asarray(masks, np.float32),
                   tuple(str(p) for p in np.asarray(paths).tolist()))

    def close(self) -> None:  # symmetry with DataLoader.close
        pass


def create_loader(dataset, batch_size: int = 4, shuffle: bool = False,
                  drop_last: bool = False, seed: int = 0,
                  num_workers: int = 4, backend: str = "native", **kwargs):
    """Loader factory: ``backend`` = 'native' (thread/process pools,
    data/loader.py) or 'grain'."""
    if backend == "grain":
        return GrainLoader(dataset, batch_size, shuffle=shuffle,
                           drop_last=drop_last, seed=seed,
                           num_workers=num_workers, **kwargs)
    if backend != "native":
        raise ValueError(f"unknown loader backend: {backend!r} "
                         "(expected 'native' or 'grain')")
    from unet_zoo_tpu.data.loader import DataLoader

    return DataLoader(dataset, batch_size, shuffle=shuffle,
                      drop_last=drop_last, seed=seed,
                      num_workers=num_workers, **kwargs)
