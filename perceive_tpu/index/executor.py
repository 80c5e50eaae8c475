"""Micro-batching search executor: coalesce concurrent queries into one sweep.

The exact scan is HBM-bound, so its cost is per-SWEEP, not per-query — one
batch-512 sweep costs barely more than a single query (BENCH_NOTES.md).  The
reference served one query at a time (Tauri command -> Searcher, one HNSW
walk per call); here concurrent callers' vectors are coalesced into one
device scan: requests enqueue, a dispatcher thread drains the queue every
``window_ms`` (or immediately when ``max_batch`` is waiting) and answers all
of them with a single ``search_vectors_batch``.

Queries with the same (k, source-filter) signature share a sweep; mixed
signatures are grouped per drain so correctness never depends on the mix.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


class _Request:
    __slots__ = ("vec", "k", "source_key", "future")

    def __init__(self, vec, k, source_key):
        self.vec = vec
        self.k = k
        self.source_key = source_key
        self.future: Future = Future()


class BatchingSearchExecutor:
    # 512 concurrent queries still sweep in one go (int8 slab measured
    # 19k QPS at Q=512, BENCH_NOTES.md round-2); beyond that the kernel
    # slabs sweeps itself, so a bigger cap only adds queueing latency
    def __init__(
        self,
        searcher,
        *,
        window_ms: float = 2.0,
        max_batch: int = 512,
        idle_factor: float = 4.0,
    ):
        self.searcher = searcher
        self.window = window_ms / 1e3
        self.max_batch = max_batch
        # a single request arriving after > idle_factor * window of dispatch
        # silence ships immediately: at concurrency 1 (the common personal-
        # search case) the coalescing window is pure added latency (VERDICT
        # r2 #7).  During a burst, dispatches are recent, so windowing (and
        # its batching win) kicks back in automatically.
        self.idle_after = idle_factor * self.window
        self._last_drain = 0.0  # monotonic time of the last batch drain
        self._queue: list[_Request] = []
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._closed = False
        # observability counters (read by serve's /metrics; monotonic,
        # written only by the dispatcher thread)
        self.sweeps_total = 0
        self.queries_total = 0
        self.query_errors_total = 0
        self.sweep_seconds_total = 0.0
        self._thread = threading.Thread(target=self._run, daemon=True, name="search-batcher")
        self._thread.start()

    # -- client API -----------------------------------------------------------

    def submit(
        self, vec: np.ndarray, k: int, source_ids: Optional[Sequence[int]] = None
    ) -> Future:
        """Enqueue one query; resolves to [(item_id, score)]."""
        key = tuple(sorted(source_ids)) if source_ids is not None else None
        req = _Request(np.asarray(vec, np.float32).reshape(-1), k, key)
        with self._wake:
            if self._closed:
                raise RuntimeError("executor closed")
            self._queue.append(req)
            self._wake.notify()
        return req.future

    def search(self, vec, k, source_ids=None, timeout: float = 30.0):
        """Blocking convenience wrapper."""
        return self.submit(vec, k, source_ids).result(timeout)

    def close(self) -> None:
        with self._wake:
            self._closed = True
            self._wake.notify()
        self._thread.join(timeout=5)

    # -- dispatcher ------------------------------------------------------------

    def _run(self) -> None:
        while True:
            with self._wake:
                while not self._queue and not self._closed:
                    self._wake.wait()
                if self._closed and not self._queue:
                    return
                # uncontended short-circuit: one queued request with no
                # recent dispatch activity pays zero window latency
                now = time.monotonic()
                if not (len(self._queue) == 1 and now - self._last_drain > self.idle_after):
                    # collect the burst: wait out the FULL window (notify
                    # from each new arrival would otherwise cut the wait
                    # short and dispatch 2-element batches)
                    deadline = now + self.window
                    while len(self._queue) < self.max_batch and not self._closed:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._wake.wait(remaining)
                batch, self._queue = self._queue[: self.max_batch], self._queue[self.max_batch :]
                self._last_drain = time.monotonic()
            self._dispatch(batch)

    def _dispatch(self, batch: list[_Request]) -> None:
        # group by (k, source filter): each group is one device sweep.
        # set_running_or_notify_cancel() both drops client-cancelled futures
        # and moves live ones to RUNNING so a later cancel() can't make
        # set_result/set_exception raise InvalidStateError and kill this
        # dispatcher thread.
        groups: dict = {}
        for r in batch:
            if r.future.set_running_or_notify_cancel():
                groups.setdefault((r.k, r.source_key), []).append(r)
        for (k, source_key), reqs in groups.items():
            t0 = time.monotonic()
            try:
                vecs = np.stack([r.vec for r in reqs])
                source_ids = list(source_key) if source_key is not None else None
                results = self.searcher.search_vectors_batch(vecs, k, source_ids)
            except Exception as e:  # noqa: BLE001 — fail the requests, not the loop
                self.query_errors_total += len(reqs)
                for r in reqs:
                    r.future.set_exception(e)
                continue
            self.sweeps_total += 1
            self.queries_total += len(reqs)
            self.sweep_seconds_total += time.monotonic() - t0
            for r, hits in zip(reqs, results):
                r.future.set_result(hits)
