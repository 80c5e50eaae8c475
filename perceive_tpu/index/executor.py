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
    __slots__ = ("vec", "text", "k", "source_key", "future")

    def __init__(self, vec, k, source_key, text=None):
        self.vec = vec
        self.text = text  # text queries ride the fused encode+sweep dispatch
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
        model=None,
        window_ms: float = 2.0,
        max_batch: int = 512,
        idle_factor: float = 4.0,
    ):
        self.searcher = searcher
        # optional encoder: enables submit_text (an uncontended text query
        # rides searcher.search_fused — encode + sweep in ONE dispatch;
        # coalesced text queries batch-encode once, then share the sweep)
        self.model = model
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

    def submit_text(
        self, query: str, k: int, source_ids: Optional[Sequence[int]] = None
    ) -> Future:
        """Enqueue a TEXT query; encode happens on the dispatcher — fused
        with the sweep into one device program when uncontended."""
        if self.model is None:
            raise RuntimeError("executor built without a model; submit vectors")
        key = tuple(sorted(source_ids)) if source_ids is not None else None
        req = _Request(None, k, key, text=query)
        with self._wake:
            if self._closed:
                raise RuntimeError("executor closed")
            self._queue.append(req)
            self._wake.notify()
        return req.future

    def search_text(self, query, k, source_ids=None, timeout: float = 30.0):
        """Blocking convenience wrapper for text queries."""
        return self.submit_text(query, k, source_ids).result(timeout)

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
        live = [r for r in batch if r.future.set_running_or_notify_cancel()]
        if len(live) == 1 and live[0].text is not None:
            # uncontended text query: encode + sweep in ONE compiled
            # dispatch (searcher.search_fused, VERDICT r2 #1)
            r = live[0]
            t0 = time.monotonic()
            try:
                source_ids = list(r.source_key) if r.source_key is not None else None
                hits = self.searcher.search_fused(self.model, r.text, r.k, source_ids)
            except Exception as e:  # noqa: BLE001
                self.query_errors_total += 1
                r.future.set_exception(e)
                return
            self.sweeps_total += 1
            self.queries_total += 1
            self.sweep_seconds_total += time.monotonic() - t0
            r.future.set_result(hits)
            return
        texts = [r for r in live if r.text is not None]
        if texts:
            # coalesced text queries: ONE batched encode dispatch, then the
            # vectors share sweeps with everything else in the drain
            try:
                vecs = self.model.encode([r.text for r in texts])
                for r, v in zip(texts, vecs):
                    r.vec = np.asarray(v, np.float32).reshape(-1)
            except Exception as e:  # noqa: BLE001
                self.query_errors_total += len(texts)
                for r in texts:
                    r.future.set_exception(e)
                live = [r for r in live if r.text is None]
        groups: dict = {}
        for r in live:
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
