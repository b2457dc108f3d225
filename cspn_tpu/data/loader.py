"""Batched, prefetching data loader (reference L2: torch DataLoader usage,
train.py:115-135).

A dependency-free loader: workers map dataset indices to samples, batches
are stacked numpy arrays, and a bounded in-flight window overlaps host
preprocessing with device steps.  Batches are emitted in deterministic
order.  Two worker modes:

  - 'thread' (default): worker threads — PIL/h5py release the GIL in
    their C cores, so IO/decode scales, but pure-Python augmentation work
    serializes on the GIL (measured knee: result/loader_bench.json);
  - 'process': persistent fork()ed worker processes fed batch indices over
    a queue (the reference's torch DataLoader worker model,
    train.py:115-120) — full per-core scaling for the Python-heavy
    augmentation chain at the cost of one pickle copy per batch.

Multi-host data parallelism: `shard=(index, count)` statically partitions the
index space per host (per-host input pipelines; SURVEY.md §2.6).
"""

from __future__ import annotations

import threading
import traceback
from typing import Iterator

import numpy as np


def _process_worker(dataset, batches, task_q, result_q):
    """Worker-process loop: pull a batch index, build the batch, push it.
    Errors travel back as (i, ('error', traceback_str))."""
    while True:
        i = task_q.get()
        if i is None:
            return
        try:
            samples = [dataset[int(j)] for j in batches[i]]
            payload = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            result_q.put((i, payload))
        except Exception:
            result_q.put((i, ("error", traceback.format_exc())))


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
        worker_mode: str = "thread",
        stall_timeout: float = 300.0,
    ):
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be thread|process: {worker_mode!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.shard_index, self.shard_count = shard
        self.worker_mode = worker_mode
        # process mode: max seconds to wait for one batch before declaring
        # the workers hung (dead workers are detected within 5 s regardless)
        self.stall_timeout = stall_timeout
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
        if self.worker_mode == "process":
            yield from self._iter_processes(batches)
            return

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

    def _iter_processes(self, batches) -> Iterator[dict[str, np.ndarray]]:
        # fork(): the dataset rides into workers for free (the reference's
        # torch-DataLoader model; spawn/forkserver would not help in this
        # environment anyway -- sitecustomize imports jax into EVERY new
        # interpreter).  Caveat: forking a heavily-threaded parent (e.g.
        # after JAX backend init) is deadlock-prone in general; the stall
        # timeout below turns any such hang -- and any killed worker --
        # into a raised error instead of a silent freeze.
        import multiprocessing as mp
        import queue as queue_lib

        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        procs = [
            ctx.Process(
                target=_process_worker,
                args=(self.dataset, batches, task_q, result_q),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        try:
            n_batches = len(batches)
            window = self.prefetch + self.num_workers
            next_task = 0
            while next_task < min(window, n_batches):
                task_q.put(next_task)
                next_task += 1
            buffered: dict[int, dict] = {}
            for i in range(n_batches):
                waited = 0.0
                while i not in buffered:
                    try:
                        j, payload = result_q.get(timeout=5.0)
                    except queue_lib.Empty:
                        dead = [p for p in procs if not p.is_alive()]
                        if dead:
                            raise RuntimeError(
                                "DataLoader worker process died without a "
                                f"result (exitcode {dead[0].exitcode}); "
                                "likely OOM-killed or crashed in native code"
                            )
                        waited += 5.0
                        if waited >= self.stall_timeout:
                            raise RuntimeError(
                                f"DataLoader stalled {waited:.0f}s waiting "
                                f"for batch {i}; workers alive but silent "
                                "(fork-after-JAX-init deadlock?)"
                            )
                        continue
                    buffered[j] = payload
                if next_task < n_batches:
                    task_q.put(next_task)
                    next_task += 1
                item = buffered.pop(i)
                if isinstance(item, tuple) and item and item[0] == "error":
                    raise RuntimeError(f"DataLoader worker failed:\n{item[1]}")
                yield item
        finally:
            for _ in procs:
                task_q.put(None)
            for p in procs:
                p.join(timeout=2.0)
                if p.is_alive():
                    p.terminate()
