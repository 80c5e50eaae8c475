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
