"""Batched data loader with per-host sharding and background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler
(tools/builder.py:14-31, datasets/build.py): each host iterates its own
shard of the epoch permutation (the pjit data axis handles per-device
splitting on top of the per-host batch). A thread pool decodes samples in
parallel; a small prefetch queue overlaps host decode with device steps.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch
        self.epoch = 0

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

        def fetch(i):
            rng = np.random.default_rng((base_seed, int(order[i])))
            return self.dataset.get(int(order[i]), rng)

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
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
                    samples = list(pool.map(fetch, idxs))
                    if not bounded_put(("batch", self._collate(samples))):
                        return
                bounded_put(("end", None))
            except BaseException as exc:  # noqa: BLE001 — relayed, not dropped
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
            pool.shutdown(wait=False)

    @staticmethod
    def _collate(samples):
        taxonomy_ids = [s[0] for s in samples]
        model_ids = [s[1] for s in samples]
        keys = samples[0][2].keys()
        batch = {k: np.stack([s[2][k] for s in samples]) for k in keys}
        return taxonomy_ids, model_ids, batch
