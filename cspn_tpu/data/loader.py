"""Batched, prefetching data loader (reference L2: torch DataLoader usage,
train.py:115-135).

A dependency-free loader: workers map dataset indices to samples, batches
are stacked numpy arrays, and a bounded in-flight window overlaps host
preprocessing with device steps.  Batches are emitted in deterministic
order.  Two worker modes:

  - 'thread' (default): worker threads — PIL/h5py release the GIL in
    their C cores, so IO/decode scales, but pure-Python augmentation work
    serializes on the GIL (measured knee: result/loader_bench.json);
  - 'process': a PERSISTENT pool of spawn()ed worker processes fed batch
    index lists over a queue (the reference's torch DataLoader worker
    model, train.py:115-120) — full per-core scaling for the Python-heavy
    augmentation chain at the cost of one pickle copy per batch.

Process-mode safety: workers are created with the 'spawn' start method,
never fork().  A real training parent has a live multithreaded JAX
runtime, and fork()ing it can deadlock the child on locks held by threads
that do not survive the fork (the exact loader mode built to feed real
training; VERDICT r4 weak #4).  Spawn pays a one-time interpreter boot per
worker (~7 s here — sitecustomize imports jax), so the pool is built once
per DataLoader and reused across epochs: tasks carry their index lists
instead of baking the epoch's batches into the workers, and every task has
a globally unique id so results from an abandoned iteration are discarded
instead of corrupting the next epoch.

Multi-host data parallelism: `shard=(index, count)` statically partitions the
index space per host (per-host input pipelines; SURVEY.md §2.6).
"""

from __future__ import annotations

import threading
import traceback
from typing import Iterator

import numpy as np


def _process_worker(dataset, task_q, result_q):
    """Worker-process loop: pull (task_id, indices), build the batch, push
    (task_id, payload).  Errors travel back as (task_id, ('error', tb))."""
    while True:
        msg = task_q.get()
        if msg is None:
            return
        task_id, idx = msg
        try:
            samples = [dataset[int(j)] for j in idx]
            payload = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            result_q.put((task_id, payload))
        except Exception:
            result_q.put((task_id, ("error", traceback.format_exc())))


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
        mp_context: str = "spawn",
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
        # process-mode start method.  'spawn' (default) is safe under a
        # live JAX runtime; 'fork' is opt-in for JAX-free parents that
        # want to skip the ~7 s/worker interpreter boot.
        self.mp_context = mp_context
        self._epoch = 0
        self._pool: dict | None = None
        self._task_seq = 0
        # cross-iteration result routing: the pool (and its result queue)
        # is shared by all live iterations of this loader, so whichever
        # generator drains the queue must deliver results to the RIGHT
        # iteration (zip(loader, loader) interleaves two).
        self._gen_seq = 0
        self._pending: dict[int, tuple[int, int]] = {}  # task -> (gen, idx)
        self._gen_results: dict[int, dict[int, object]] = {}

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

    def _ensure_pool(self) -> dict:
        """Create (or re-create after a worker death) the persistent
        spawn-context worker pool.  The dataset is pickled into each worker
        once, at pool construction — NOT per epoch."""
        pool = self._pool
        if pool is not None and all(p.is_alive() for p in pool["procs"]):
            return pool
        self.close()
        import multiprocessing as mp

        ctx = mp.get_context(self.mp_context)
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        procs = [
            ctx.Process(
                target=_process_worker,
                args=(self.dataset, task_q, result_q),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        self._pool = {"procs": procs, "task_q": task_q, "result_q": result_q}
        return self._pool

    def close(self) -> None:
        """Shut down the process-mode worker pool (no-op otherwise)."""
        pool, self._pool = self._pool, None
        if pool is None:
            return
        for _ in pool["procs"]:
            try:
                pool["task_q"].put_nowait(None)
            except Exception:
                pass
        for p in pool["procs"]:
            p.join(timeout=2.0)
            if p.is_alive():
                p.terminate()
        for q in (pool["task_q"], pool["result_q"]):
            try:
                q.close()
                q.cancel_join_thread()
            except Exception:
                pass

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _stash(self, task_id, payload) -> None:
        """Deliver a queue result to whichever live iteration issued it;
        results of abandoned iterations (task id no longer pending) drop."""
        target = self._pending.pop(task_id, None)
        if target is not None:
            gen_id, idx = target
            bucket = self._gen_results.get(gen_id)
            if bucket is not None:
                bucket[idx] = payload

    def _iter_processes(self, batches) -> Iterator[dict[str, np.ndarray]]:
        import queue as queue_lib

        pool = self._ensure_pool()
        task_q, result_q = pool["task_q"], pool["result_q"]
        procs = pool["procs"]
        n_batches = len(batches)
        window = self.prefetch + self.num_workers
        gen_id = self._gen_seq
        self._gen_seq += 1
        buffered = self._gen_results.setdefault(gen_id, {})
        next_task = 0

        def submit():
            nonlocal next_task
            self._pending[self._task_seq] = (gen_id, next_task)
            task_q.put((self._task_seq, np.asarray(batches[next_task])))
            self._task_seq += 1
            next_task += 1

        try:
            while next_task < min(window, n_batches):
                submit()
            for i in range(n_batches):
                waited = 0.0
                while i not in buffered:
                    try:
                        task_id, payload = result_q.get(timeout=5.0)
                    except queue_lib.Empty:
                        dead = [p for p in procs if not p.is_alive()]
                        if dead:
                            # drain everything already delivered before
                            # deciding: the dead worker's task need not be
                            # the batch this loop is awaiting (ADVICE r4)
                            try:
                                while True:
                                    self._stash(*result_q.get_nowait())
                            except queue_lib.Empty:
                                pass
                            if i in buffered:
                                break
                            raise RuntimeError(
                                "DataLoader worker process died (exitcode "
                                f"{dead[0].exitcode}) and batch {i} has "
                                "not arrived; likely OOM-killed or "
                                "crashed in native code"
                            )
                        waited += 5.0
                        if waited >= self.stall_timeout:
                            raise RuntimeError(
                                f"DataLoader stalled {waited:.0f}s waiting "
                                f"for batch {i}; workers alive but silent"
                            )
                        continue
                    self._stash(task_id, payload)
                if next_task < n_batches:
                    submit()
                item = buffered.pop(i)
                if isinstance(item, tuple) and item and item[0] == "error":
                    raise RuntimeError(f"DataLoader worker failed:\n{item[1]}")
                yield item
        finally:
            self._gen_results.pop(gen_id, None)
            for tid in [t for t, (g, _) in self._pending.items() if g == gen_id]:
                self._pending.pop(tid, None)
