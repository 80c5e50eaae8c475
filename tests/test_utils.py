"""Concurrency-utility tests, modeled on the reference's hardest unit tests
(batch_sender.rs:102-222 stress test; time_tracker.rs:70-107 overlap test)."""

import queue
import threading
import time

from perceive_tpu.utils import BatchSender, TimeTracker


def test_batch_sender_flush_on_close_empty():
    q: queue.Queue = queue.Queue()
    BatchSender(q, 4).close()
    assert q.empty()


def test_batch_sender_exact_batches():
    q: queue.Queue = queue.Queue()
    with BatchSender(q, 3) as bs:
        for i in range(7):
            bs.add(i)
    batches = []
    while not q.empty():
        batches.append(q.get())
    assert batches == [[0, 1, 2], [3, 4, 5], [6]]


def test_batch_sender_multiple_of_batch_size():
    q: queue.Queue = queue.Queue()
    with BatchSender(q, 2) as bs:
        for i in range(6):
            bs.add(i)
    batches = []
    while not q.empty():
        batches.append(q.get())
    assert batches == [[0, 1], [2, 3], [4, 5]]


def test_batch_sender_no_lost_items_under_stress():
    q: queue.Queue = queue.Queue()
    n_threads, per_thread = 10, 200
    bs = BatchSender(q, 7)
    barrier = threading.Barrier(n_threads)

    def worker(t):
        barrier.wait()
        for i in range(per_thread):
            bs.add((t, i))

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    bs.close()

    seen = set()
    while not q.empty():
        for item in q.get():
            assert item not in seen
            seen.add(item)
    assert len(seen) == n_threads * per_thread


def test_time_tracker_single():
    t = TimeTracker()
    with t.track():
        time.sleep(0.05)
    assert 0.04 <= t.elapsed() <= 0.5


def test_time_tracker_overlapping_counts_wall_once():
    t = TimeTracker()
    n = 10
    barrier = threading.Barrier(n)

    def worker():
        barrier.wait()
        with t.track():
            time.sleep(0.05)

    threads = [threading.Thread(target=worker) for _ in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    # 10 overlapping 50 ms spans accrue ~50 ms, not 500 ms
    assert t.elapsed() < 0.25
