"""Incremental device-sync path: small deltas must scatter in place (not
re-upload), and query results must reflect them immediately."""

import numpy as np

from perceive_tpu.index import Searcher

DIM = 64


def _vecs(rng, n):
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_incremental_upsert_and_tombstone_after_sync():
    rng = np.random.default_rng(0)
    s = Searcher(0, 0, DIM, engine="xla")
    base = _vecs(rng, 2000)
    s.upsert_embeddings(range(2000), [1] * 2000, base)
    s.matrix.sync()  # full upload
    assert not s.matrix._dirty and not s.matrix._dirty_rows

    # incremental append (delta << rows/4 -> scatter path)
    extra = _vecs(rng, 10)
    s.upsert_embeddings(range(5000, 5010), [2] * 10, extra)
    assert s.matrix._dirty_rows and not s.matrix._dirty
    top = s.search_vector(extra[3], 3)
    assert top[0][0] == 5003

    # incremental overwrite: item 0 becomes a duplicate of extra[3]
    s.upsert_embeddings([0], [1], extra[3:4])
    top = s.search_vector(extra[3], 3)
    assert {top[0][0], top[1][0]} == {0, 5003}

    # tombstone via scatter
    s.remove_items([5003])
    top = s.search_vector(extra[3], 3)
    assert 5003 not in [iid for iid, _ in top]

    # growth after sync forces a clean full re-upload
    big = _vecs(rng, 3000)
    s.upsert_embeddings(range(10000, 13000), [3] * 3000, big)
    top = s.search_vector(big[7], 1)
    assert top[0][0] == 10007


def test_search_retries_when_tombstoned_row_is_reused():
    """A freed row handed to a NEW item between a sweep's device capture and
    the host-side row decode must not attribute the old row's score to the
    new item: the searcher snapshots matrix.reuse_gen and retries the sweep
    when it moved (review r2: matrix.py free-list reuse race)."""
    rng = np.random.default_rng(5)
    s = Searcher(0, 0, DIM, dtype=np.float32, engine="xla")
    a, b, c = _vecs(rng, 3)
    s.upsert_embeddings([1, 2], [0, 0], np.stack([a, b]))

    orig_scan = s._scan_filtered
    raced = {"n": 0}

    def racing_scan(q, k, source_ids, **kw):
        vals, rows, full, depth = orig_scan(q, k, source_ids, **kw)
        if raced["n"] == 0:
            raced["n"] += 1
            # concurrent churn AFTER the sweep: item 1's row is freed and
            # immediately reused for new item 3 (vector c)
            from perceive_tpu.index.matrix import chunk_key

            s.remove_items([1])
            s.upsert_embeddings([3], [0], c.reshape(1, -1))
            assert s.matrix.row_of[chunk_key(3, 0)] in set(rows.ravel().tolist())
        return vals, rows, full, depth

    s._scan_filtered = racing_scan
    hits = dict(s.search_vector(a, 2))

    # without the retry, item 3 would surface with item 1's score (~1.0);
    # the consistent result scores item 3 with ITS vector
    assert raced["n"] == 1
    assert s.matrix.reuse_gen == 1
    if 3 in hits:
        assert abs(hits[3] - float(c @ a)) < 1e-5
    assert hits.get(1) is None  # removed item must not appear


def test_multigroup_filter_deepens_until_k_distinct():
    """Filtered searches spanning >1 scan group (> MAX_SOURCE_FILTER
    sources) must judge fetch exhaustion on the PER-GROUP depth, not the
    merged candidate width (review r3 CONFIRMED: a 17-source filter
    returned 6 of 32 available items — 2 groups x kb columns tripped the
    cap after the first sweep while each group had fetched only kb deep)."""
    from perceive_tpu.index.searcher import MAX_SOURCE_FILTER

    rng = np.random.default_rng(41)
    s = Searcher(0, 0, DIM, dtype=np.float32, engine="xla")
    q = rng.standard_normal(DIM).astype(np.float32)
    q /= np.linalg.norm(q)
    # one doc in source 1 with 60 near-query chunks (crowds the buffer)...
    chunks = q[None, :] + 0.05 * rng.standard_normal((60, DIM)).astype(np.float32)
    s.upsert_embeddings([(1, ci) for ci in range(60)], [1] * 60, chunks)
    # ...plus 40 distinct lower-scoring items in source 1
    others = 0.3 * q[None, :] + 0.1 * rng.standard_normal((40, DIM)).astype(np.float32)
    s.upsert_embeddings(list(range(2, 42)), [1] * 40, others)
    # and one item in each of sources 2..17 so the filter needs 2 groups
    extra = rng.standard_normal((16, DIM)).astype(np.float32)
    s.upsert_embeddings(list(range(100, 116)), list(range(2, 18)), extra)

    filt = list(range(1, 18))
    assert len(filt) > MAX_SOURCE_FILTER  # 2 scan groups
    k = 32
    unfiltered = s.search_vector(q, k)
    filtered = s.search_vector(q, k, source_ids=filt)
    assert len(unfiltered) == k
    assert len(filtered) == k, (
        f"filtered multi-group search returned {len(filtered)} < k={k}"
    )
    assert {i for i, _ in filtered} == {i for i, _ in unfiltered}


def test_fetch_depth_stable_while_corpus_grows_within_bucket():
    """kb (a STATIC jit argument) must not track the raw live-row count —
    every ingest batch would otherwise recompile the scan programs,
    including the fused encode+sweep program (review r3).  It clamps to the
    sweep ladder, which moves in >= 12.5% steps."""
    from perceive_tpu.index.searcher import _k_bucket

    rng = np.random.default_rng(43)
    s = Searcher(0, 0, DIM, dtype=np.float32, engine="xla")
    s.upsert_embeddings(list(range(1, 1501)), [0] * 1500, _vecs(rng, 1500))
    want = s._first_fetch(1024)
    kb0 = _k_bucket(want, s.matrix.sweep_rows)
    seen = {kb0}
    for step in range(10):  # ten ingest batches of 20 rows
        base = 2000 + step * 20
        s.upsert_embeddings(list(range(base, base + 20)), [0] * 20, _vecs(rng, 20))
        seen.add(_k_bucket(want, s.matrix.sweep_rows))
    assert len(seen) <= 2, f"kb changed {len(seen)} times across 10 batches: {seen}"
