"""Batched data loader with per-host sharding and background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(tools/builder.py:14-31, datasets/build.py): each host iterates its own
shard of the epoch permutation (the pjit data axis handles per-device
splitting on top of the per-host batch). A worker pool decodes samples in
parallel; a small prefetch queue overlaps host decode with device steps.

Two worker modes (``worker_mode``):

- ``"thread"`` (default): ThreadPoolExecutor. The decode hot path releases
  the GIL for most of its time (pcio native reads, PIL decode, numpy
  transforms), so threads scale on multi-core hosts without IPC overhead.
- ``"process"``: ProcessPoolExecutor over a FORKSERVER context — the
  analog of the torch DataLoader's ``num_workers`` processes. Sidesteps
  the GIL entirely for the pure-Python slice of decode; samples come back
  pickled (small: ≤~175 KB each). Forkserver (not plain fork): the loader
  forks from inside a producer thread, and fork() in a multi-threaded
  parent deadlocks nondeterministically on inherited lock state (observed
  on this host; CPython 3.12 warns about exactly this) — the forkserver's
  clean single-threaded server process forks safely, at the cost of
  pickling the dataset once per pool (datasets are small: file lists +
  config, a few KB). Workers must not touch jax — datasets here are
  numpy/PIL/ctypes only.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from concurrent.futures.process import BrokenProcessPool
from typing import Iterator

import numpy as np

# per-worker dataset for worker_mode="process" (set by _init_worker from
# the pickled initargs in each forkserver child)
_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _fetch_in_worker(task):
    idx, base_seed = task
    rng = np.random.default_rng((base_seed, idx))
    return _WORKER_DATASET.get(idx, rng)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        drop_last: bool,
        seed: int = 0,
        num_workers: int = 8,
        num_hosts: int = 1,
        host_id: int = 0,
        prefetch: int = 2,
        worker_mode: str = "thread",
    ):
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be thread|process, got {worker_mode!r}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch
        self.worker_mode = worker_mode
        self.epoch = 0
        self._proc_pool = None  # persistent across epochs (see _get_proc_pool)

    def _get_proc_pool(self):
        """Persistent forkserver pool (torch persistent_workers analog):
        worker bootstrap re-imports the package (seconds) — paying it once
        per LOADER instead of once per epoch."""
        if self._proc_pool is None:
            import multiprocessing

            self._proc_pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("forkserver"),
                initializer=_init_worker,
                initargs=(self.dataset,),
            )
        return self._proc_pool

    def close(self):
        """Shut down the persistent process pool (no-op in thread mode)."""
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None

    def __del__(self):  # best-effort; close() is the explicit path
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (reference DistributedSampler.set_epoch,
        tools/runner.py:113-114)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        # per-host contiguous shard, padded so every host sees equal length
        per_host = -(-n // self.num_hosts)
        if self.num_hosts > 1:
            pad = per_host * self.num_hosts - n
            order = np.concatenate([order, order[:pad]])
            order = order[self.host_id::self.num_hosts]
        return order

    def __len__(self):
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        order = self._epoch_indices()
        nb = len(self)
        base_seed = (self.seed * 7919 + self.epoch) & 0x7FFFFFFF

        if self.worker_mode == "process":
            pool = self._get_proc_pool()
            own_pool = False  # persistent: NOT shut down per epoch

            def fetch_batch(idxs):
                # one round-trip per sample; ProcessPoolExecutor raises
                # BrokenProcessPool through .map if a worker dies → surfaced
                # by the producer's error path like any decode exception
                return list(
                    pool.map(
                        _fetch_in_worker,
                        [(int(order[i]), base_seed) for i in idxs],
                    )
                )
        else:
            def fetch(i):
                rng = np.random.default_rng((base_seed, int(order[i])))
                return self.dataset.get(int(order[i]), rng)

            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            own_pool = True

            def fetch_batch(idxs):
                return list(pool.map(fetch, idxs))

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def bounded_put(msg) -> bool:
            # never block forever: an abandoned consumer (exception in a
            # train step, early break, GC'd generator) sets `stop` but can
            # no longer drain the queue — a plain q.put would deadlock the
            # producer holding prefetched batches + the thread pool
            while not stop.is_set():
                try:
                    q.put(msg, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # decode errors are SURFACED, not swallowed: the torch
            # DataLoader re-raises worker exceptions in the main process;
            # silently truncating the epoch would corrupt schedules/metrics
            # with no diagnostic
            try:
                for b in range(nb):
                    idxs = list(range(b * self.batch_size, min((b + 1) * self.batch_size, len(order))))
                    if self.drop_last and len(idxs) < self.batch_size:
                        break
                    samples = fetch_batch(idxs)
                    if not bounded_put(("batch", self._collate(samples))):
                        return
                bounded_put(("end", None))
            except BaseException as exc:  # noqa: BLE001 — relayed, not dropped
                if isinstance(exc, BrokenProcessPool):
                    # a dead worker poisons the whole executor permanently;
                    # drop it so the NEXT epoch/iteration builds a fresh
                    # pool instead of failing instantly forever
                    self.close()
                bounded_put(("error", exc))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, item = q.get()
                if kind == "end":
                    break
                if kind == "error":
                    # torch DataLoader re-raises the worker's ORIGINAL
                    # exception type (ExceptionWrapper.reraise), so callers
                    # catching e.g. OSError for a corrupt shard still match;
                    # the worker-side traceback rides along on __traceback__.
                    # Non-Exception BaseExceptions (KeyboardInterrupt in a
                    # worker) get wrapped so the consumer loop's contract
                    # stays "Exception out of __iter__".
                    if isinstance(item, Exception):
                        raise item
                    raise RuntimeError(
                        "DataLoader worker failed while decoding a batch"
                    ) from item
                yield item
        finally:
            stop.set()
            if own_pool:
                pool.shutdown(wait=False, cancel_futures=True)

    @staticmethod
    def _collate(samples):
        taxonomy_ids = [s[0] for s in samples]
        model_ids = [s[1] for s in samples]
        keys = samples[0][2].keys()
        batch = {k: np.stack([s[2][k] for s in samples]) for k in keys}
        return taxonomy_ids, model_ids, batch
