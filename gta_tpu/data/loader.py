"""Batched loader with background prefetch.

Map-style datasets are batched with a thread pool (image decode/raytrace is
numpy/PIL work that releases the GIL) and the next batch is prefetched
while the accelerator runs the current step — the host-side analogue of
the reference's pinned-memory DataLoader workers (train.py:149-157).
Iterable datasets (MSN) are consumed in stream order on a background
thread with the same bounded prefetch queue; per-item preprocessing
parallelism lives inside the dataset (msn.MultiShapeNet prep pool).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from gta_tpu.data.synthetic import collate
from gta_tpu.models.context import SceneBatch


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch: int = 2,
        shard_index: int = 0,
        shard_count: int = 1,
        collate_fn=None,
    ):
        self.collate = collate_fn if collate_fn is not None else collate
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.epoch = 0
        self._iterable = not hasattr(dataset, "__getitem__")

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        if self._iterable:
            return len(self.dataset) // (self.batch_size * self.shard_count)
        n = len(self.dataset) // self.shard_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous per-shard slice of the (shuffled) index list, truncated
        # evenly so all shards yield the same number of batches
        per = n // self.shard_count
        idx = idx[self.shard_index * per : (self.shard_index + 1) * per]
        return idx

    def _iter_map(self) -> Iterator[SceneBatch]:
        idx = self._indices()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        with ThreadPoolExecutor(self.num_workers) as pool:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            stop = threading.Event()

            def produce():
                try:
                    for b in range(nb):
                        if stop.is_set():
                            return
                        sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                        items = list(pool.map(self.dataset.__getitem__, sel))
                        q.put(self.collate(items))
                finally:
                    q.put(None)

            t = threading.Thread(target=produce, daemon=True)
            t.start()
            try:
                while True:
                    batch = q.get()
                    if batch is None:
                        break
                    yield batch
            finally:
                stop.set()
                # drain so the producer can finish
                while t.is_alive():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        pass
                    t.join(timeout=0.1)

    def _iter_iterable(self) -> Iterator[SceneBatch]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                items = []
                for item in self.dataset:
                    if stop.is_set():
                        return
                    items.append(item)
                    if len(items) == self.batch_size:
                        q.put(self.collate(items))
                        items = []
                if items and not self.drop_last:
                    q.put(self.collate(items))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)

    def __iter__(self) -> Iterator[SceneBatch]:
        return self._iter_iterable() if self._iterable else self._iter_map()
