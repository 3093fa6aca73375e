"""Batch loader: samplers + threaded prefetch, fixed-shape numpy batches.

Replaces torch DataLoader + PartialSampler + MultiEpochDataLoader
(lib/dataset/samplers.py, multiepoch_dataloader.py). Workers are threads
(PIL/numpy release the GIL for the heavy ops) feeding a bounded queue, so
the accelerator never waits on Python between epochs — the property the
reference's MultiEpochDataLoader hacks into torch internals
(multiepoch_dataloader.py:7-59) falls out of the design here: the loader
IS one persistent iterator over an index stream.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from .dream import DreamDataset, collate


class PartialSampler:
    """Random subset of size epoch_size per epoch (ref samplers.py:7-20).

    Extension over the reference: when epoch_size exceeds the dataset size
    (tiny datasets, e.g. the bundled 6-image dofbot set), the epoch is
    filled by tiling shuffled permutations so every index appears
    ~epoch_size/n times — the per-item augmentations still randomize each
    visit. The reference silently truncates to n (samplers.py:16)."""

    def __init__(self, n_items: int, epoch_size: Optional[int], seed: int = 0):
        self.n_items = n_items
        self.epoch_size = epoch_size or n_items
        self.rng = np.random.RandomState(seed)

    def epoch_indices(self) -> np.ndarray:
        if self.epoch_size <= self.n_items:
            return self.rng.permutation(self.n_items)[: self.epoch_size]
        reps = -(-self.epoch_size // self.n_items)
        idx = np.concatenate(
            [self.rng.permutation(self.n_items) for _ in range(reps)]
        )
        return idx[: self.epoch_size]


class ListSampler:
    """Fixed index list (ref samplers.py:23-31)."""

    def __init__(self, ids: Sequence[int]):
        self.ids = list(ids)

    def epoch_indices(self) -> np.ndarray:
        return np.asarray(self.ids)


class WeightedSampler:
    """Weighted with-replacement sampling (ref train_depthnet.py:89-92)."""

    def __init__(self, weights: np.ndarray, epoch_size: int, seed: int = 0):
        w = np.asarray(weights, np.float64)
        self.p = w / w.sum()
        self.epoch_size = epoch_size
        self.rng = np.random.RandomState(seed)

    def epoch_indices(self) -> np.ndarray:
        return self.rng.choice(len(self.p), size=self.epoch_size, p=self.p)


class DataLoader:
    """Persistent multi-worker loader producing collated numpy batches."""

    def __init__(
        self,
        dataset: DreamDataset,
        batch_size: int,
        sampler=None,
        shuffle: bool = True,
        num_workers: int = 4,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 4,
        process_shard: Optional[tuple] = None,
    ):
        """`batch_size` is the GLOBAL batch size. In a multi-host run each
        process loads only its `batch[index::count]` slice of every global
        batch (the DistributedSampler semantics of ref
        train_depthnet.py:83-97): samplers are identically seeded on all
        hosts, so the index stream is globally consistent and disjointly
        partitioned. `process_shard=(index, count)` defaults to
        `(jax.process_index(), jax.process_count())`."""
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.sampler = sampler
        self._epoch = 0
        if process_shard is None:
            import jax

            process_shard = (jax.process_index(), jax.process_count())
        self.process_index, self.process_count = process_shard
        if self.process_count > 1 and batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{self.process_count} processes"
            )

    @property
    def local_batch_size(self) -> int:
        """Per-process slice of the global batch."""
        return self.batch_size // self.process_count

    def __len__(self):
        n = (
            self.sampler.epoch_size
            if isinstance(self.sampler, (PartialSampler, WeightedSampler))
            else len(self.ds)
        )
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        if self.sampler is not None:
            return self.sampler.epoch_indices()
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            return rng.permutation(len(self.ds))
        return np.arange(len(self.ds))

    def __iter__(self) -> Iterator[dict]:
        idx = self._indices()
        self._epoch += 1
        batches: List[np.ndarray] = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.process_count > 1:
            # this process loads only its strided slice of each global batch
            batches = [b[self.process_index :: self.process_count] for b in batches]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        job_q: "queue.Queue" = queue.Queue()
        for bi, b in enumerate(batches):
            job_q.put((bi, b))
        results = {}
        next_emit = [0]
        lock = threading.Lock()
        stop = threading.Event()

        def worker(wid):
            rng = np.random.RandomState((self.seed, self._epoch, wid))
            while not stop.is_set():
                try:
                    bi, b = job_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = [self.ds.__getitem__(int(i), rng=rng) for i in b]
                    batch = collate(samples)
                except Exception as e:  # surface worker errors to consumer
                    batch = e
                with lock:
                    results[bi] = batch
                    while next_emit[0] in results:
                        out_q.put(results.pop(next_emit[0]))
                        next_emit[0] += 1

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                item = out_q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
