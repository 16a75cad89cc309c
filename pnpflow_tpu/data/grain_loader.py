"""Grain-based input pipeline for the file datasets (ROADMAP #7).

Production replacement for the thread-prefetch `_FileDataset` path
(data/datasets.py:61-98): multiprocess decode/transform workers,
deterministic per-epoch shuffling, and the same iterator contract —
``(images NHWC float32, labels int32)`` batches — so it drops into the
trainer and solvers unchanged.  The reference's analogue is torch
``DataLoader(num_workers=4)`` in the vendored trainer
(run_lib_pytorch.py:85-88).

Opt-in: ``DataLoaders(..., backend="grain", num_workers=N)`` or
``--opts data_backend grain``.
"""

from __future__ import annotations

import os
import warnings

import numpy as np


class _ImageSource:
    """grain RandomAccessDataSource over image files: decode + transform.

    Missing files are dropped at construction (the reference drops them at
    collate time, dataloaders.py:213-219 — same membership for a static
    tree, but index-stable as grain requires).
    """

    def __init__(self, paths, transform):
        kept = []
        for p in paths:
            if os.path.exists(p):
                kept.append(p)
            else:
                warnings.warn(f"File not found: {p}. Skipping.")
        self.paths = kept
        self.transform = transform

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        from PIL import Image

        img = Image.open(self.paths[int(idx)]).convert("RGB")
        return self.transform(img).astype(np.float32)


class GrainFileLoader:
    """Per-epoch iterable with the `_FileDataset` contract, backed by a
    grain DataLoader (worker processes, deterministic shuffle seeded by
    ``seed + epoch`` like the thread path)."""

    def __init__(self, paths, batch_size, transform, shuffle=False, seed=0,
                 drop_last=False, num_workers: int = 4):
        self.source = _ImageSource(paths, transform)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self._epoch = 0

    def __len__(self):
        n = len(self.source)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        import grain.python as gp

        sampler = gp.IndexSampler(
            num_records=len(self.source),
            shard_options=gp.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + self._epoch,
        )
        self._epoch += 1
        loader = gp.DataLoader(
            data_source=self.source,
            sampler=sampler,
            operations=[gp.Batch(self.batch_size,
                                 drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )
        for batch in loader:
            imgs = np.asarray(batch)
            yield imgs, np.zeros(len(imgs), dtype=np.int32)
