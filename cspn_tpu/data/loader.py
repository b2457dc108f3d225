"""Batched, prefetching data loader (reference L2: torch DataLoader usage,
train.py:115-135).

A dependency-free loader: worker threads (PIL/h5py release the GIL in their
C cores) map dataset indices to samples, batches are stacked numpy arrays,
and a bounded in-flight window overlaps host preprocessing with device steps.
Batches are emitted in deterministic order.

Multi-host data parallelism: `shard=(index, count)` statically partitions the
index space per host (per-host input pipelines; SURVEY.md §2.6).
"""

from __future__ import annotations

import threading
from typing import Iterator

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        shard: tuple[int, int] = (0, 1),
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.shard_index, self.shard_count = shard
        self._epoch = 0

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        return idx[self.shard_index :: self.shard_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        indices = self._indices()
        self._epoch += 1
        n_batches = len(indices) // self.batch_size
        if len(indices) % self.batch_size and not self.drop_last:
            n_batches += 1
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        cond = threading.Condition()
        results: dict[int, object] = {}
        state = {"next_task": 0, "next_emit": 0, "stop": False}

        def worker():
            while True:
                with cond:
                    while (
                        not state["stop"]
                        and state["next_task"] < n_batches
                        and state["next_task"] - state["next_emit"] >= self.prefetch
                    ):
                        cond.wait(0.1)
                    if state["stop"] or state["next_task"] >= n_batches:
                        return
                    i = state["next_task"]
                    state["next_task"] += 1
                try:
                    samples = [self.dataset[int(j)] for j in batches[i]]
                    batch: object = {
                        k: np.stack([s[k] for s in samples]) for k in samples[0]
                    }
                except Exception as e:  # surface worker errors to the consumer
                    batch = e
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for i in range(n_batches):
                with cond:
                    while i not in results:
                        cond.wait(0.1)
                    item = results.pop(i)
                    state["next_emit"] = i + 1
                    cond.notify_all()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            with cond:
                state["stop"] = True
                cond.notify_all()
            for t in threads:
                t.join(timeout=2.0)
