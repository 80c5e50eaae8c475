"""Index/searcher tests: exact-scan correctness vs a numpy oracle, source
filtering, tombstones, incremental updates, snapshots, DB round trip."""

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.index import EmbeddingMatrix, Searcher, deserialize_embedding, serialize_embedding
from perceive_tpu.types import Source

DIM = 64


def _rand_vecs(rng, n, normalize=True):
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    if normalize:
        v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _oracle_topk(vectors, q, k):
    scores = vectors @ q
    order = np.argsort(-scores)[:k]
    return order, scores[order]


def test_auto_matrix_dtype_tiers():
    """The default storage tier keys on corpus size (VERDICT r2 #2): least
    quantization that keeps the bandwidth-bound sweep under ~2 ms."""
    import jax.numpy as jnp

    from perceive_tpu.index.matrix import INT2, INT4, auto_matrix_dtype

    assert auto_matrix_dtype(0) == jnp.bfloat16
    assert auto_matrix_dtype(1_500_000) == jnp.bfloat16
    assert auto_matrix_dtype(1_500_001) == jnp.int8
    assert auto_matrix_dtype(4_000_000) == jnp.int8
    assert auto_matrix_dtype(10_000_000) == INT2
    assert auto_matrix_dtype(24_000_001) == INT4


def test_auto_retier_on_mid_session_growth(monkeypatch):
    """With auto_retier on, a corpus crossing a tier threshold MID-SESSION
    switches storage dtype in place (restaged from the host mirror) and
    keeps returning exact results through the new tier's rerank."""
    import jax.numpy as jnp

    import perceive_tpu.index.matrix as matmod
    from perceive_tpu.index.searcher import Searcher

    monkeypatch.setattr(
        matmod, "auto_matrix_dtype",
        lambda n, padded_dim=384: jnp.int8 if n > 50 else jnp.bfloat16,
    )
    rng = np.random.default_rng(3)
    d = 16
    vecs = rng.standard_normal((100, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    s = Searcher(0, 0, d, dtype=jnp.bfloat16, engine="xla")
    s.auto_retier = True
    s.upsert_embeddings(list(range(1, 41)), [0] * 40, vecs[:40])
    assert not s.matrix.quantized  # under the (patched) threshold
    assert s.search_vector(vecs[7], 1)[0][0] == 8

    s.upsert_embeddings(list(range(41, 101)), [0] * 60, vecs[40:])
    assert s.matrix.quantized and s.matrix.quant_bits == 8  # re-tiered
    q = vecs[77] + 0.01 * rng.standard_normal(d).astype(np.float32)
    hits = s.search_vector(q, 5)
    want = np.argsort(-(vecs @ q), kind="stable")[:5] + 1
    assert [i for i, _ in hits] == list(want)  # exact via the new rerank


def test_sweep_rows_ladder():
    """sweep_rows_for: small matrices sweep the capacity; large ones sweep
    a 24576-aligned ladder round-up of the high-water mark (<= 12.5%
    overhang), clamped to capacity — so the per-query sweep skips the
    dead rows power-of-2 capacity growth leaves past the hwm."""
    from perceive_tpu.index.matrix import _SWEEP_ALIGN, _SWEEP_MIN, sweep_rows_for

    assert sweep_rows_for(100, 4096) == 4096  # small: whole capacity
    assert sweep_rows_for(0, _SWEEP_MIN) == _SWEEP_MIN
    # large capacity, small hwm: ladder value, aligned, bounded overhang
    cap = 16_777_216  # 4096 * 2**12 — a real power-of-2 growth endpoint
    for hwm in (1, 98_304, 100_000, 1_000_000, 10_000_000, 16_000_000):
        ns = sweep_rows_for(hwm, cap)
        assert hwm <= ns <= cap
        assert ns == cap or ns % _SWEEP_ALIGN == 0
        assert ns <= max(_SWEEP_MIN, int(hwm * 1.125) + _SWEEP_ALIGN)
    # hwm at/above capacity: sweep everything
    assert sweep_rows_for(cap, cap) == cap
    # monotone in hwm (a growing corpus never shrinks its sweep)
    vals = [sweep_rows_for(h, cap) for h in range(0, 2_000_000, 37_123)]
    assert vals == sorted(vals)


def test_prefix_sweep_exact_past_sweep_min():
    """A matrix whose capacity crosses _SWEEP_MIN sweeps only the ladder
    prefix (sweep_rows < capacity) yet stays exact — rows live near the
    high-water mark must be found."""
    import jax.numpy as jnp

    from perceive_tpu.index.matrix import _SWEEP_MIN

    rng = np.random.default_rng(11)
    d, n = 16, 120_000  # capacity doubles to 131072 > _SWEEP_MIN
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    s = Searcher(0, 0, d, dtype=jnp.bfloat16, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    m = s.matrix
    assert m.capacity > _SWEEP_MIN
    assert n <= m.sweep_rows < m.capacity  # the prefix actually engages
    # query targeting a row at the very top of the hwm (inside the ladder
    # round-up, past any naive truncation bug)
    q = vecs[n - 3] + 0.005 * rng.standard_normal(d).astype(np.float32)
    want = np.argsort(-(vecs @ q), kind="stable")[:5] + 1
    assert [i for i, _ in s.search_vector(q, 5)] == list(want)


def test_compact_lowers_hwm_after_mass_removal():
    """Removing most of the corpus auto-compacts: live rows pack into the
    prefix, the high-water mark (and hence sweep_rows) drops back, reuse_gen
    bumps so in-flight searches retry, and searches stay exact."""
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    d, n = 16, 12_000
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    # source 0 = ids 1..8000, source 1 = ids 8001..12000
    s.upsert_embeddings(list(range(1, 8001)), [0] * 8000, vecs[:8000])
    s.upsert_embeddings(list(range(8001, n + 1)), [1] * 4000, vecs[8000:])
    m = s.matrix
    assert m.rows == n
    gen0 = m.reuse_gen
    removed = m.remove_source(0)
    assert removed == 8000
    assert m.rows == 4000  # compacted: hwm back to the live count
    assert m.reuse_gen > gen0
    assert not m._free
    # all survivors findable and exact
    q = vecs[8000 + 1234] + 0.005 * rng.standard_normal(d).astype(np.float32)
    exact = vecs @ q
    exact[:8000] = -np.inf
    want = (np.argsort(-exact, kind="stable")[:5] + 1).tolist()
    assert [i for i, _ in s.search_vector(q, 5)] == want
    # post-compact upserts land in fresh rows without clobbering survivors
    s.upsert_embeddings([90001], [2], vecs[:1])
    assert m.rows == 4001
    got = [i for i, _ in s.search_vector(vecs[0], 1)]
    assert got == [90001]


def test_compact_noop_below_threshold():
    """Light churn must NOT move rows (delta-snapshot churn for nothing)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(22)
    d, n = 16, 6_000
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    s = Searcher(0, 0, d, dtype=jnp.bfloat16, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    m = s.matrix
    s.remove_items(list(range(1, 101)))  # 100 tombstones << _COMPACT_MIN
    assert m.rows == n  # hwm unchanged
    assert len(m._free) == 100  # slots queued for reuse, not compacted


def test_serialize_roundtrip():
    v = np.random.default_rng(0).standard_normal(384).astype(np.float32)
    assert np.array_equal(deserialize_embedding(serialize_embedding(v)), v)


def test_matrix_upsert_and_remove():
    m = EmbeddingMatrix(DIM, capacity=8)  # forces growth
    rng = np.random.default_rng(0)
    v = _rand_vecs(rng, 1000)
    m.upsert(range(1000), [7] * 1000, v)
    assert len(m) == 1000
    assert m.capacity % 512 == 0 and m.capacity >= 1000
    # overwrite keeps the same row
    row_before = m.row_of[5]
    m.upsert([5], [7], v[:1])
    assert m.row_of[5] == row_before and len(m) == 1000
    assert m.remove([5, 6, 99999]) == 2
    assert len(m) == 998


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_searcher_exact_topk_matches_oracle(dtype_name):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 3000
    vecs = _rand_vecs(rng, n)
    s = Searcher(0, 0, DIM, dtype=getattr(jnp, dtype_name), engine="xla")
    s.upsert_embeddings(range(n), [1] * n, vecs)

    q = _rand_vecs(rng, 1)[0]
    got = s.search_vector(q, 10)
    oracle_rows, oracle_scores = _oracle_topk(vecs, q, 10)
    got_ids = [iid for iid, _ in got]
    if dtype_name == "float32":
        assert got_ids == list(oracle_rows)
        np.testing.assert_allclose([sc for _, sc in got], oracle_scores, rtol=1e-5)
    else:
        # bf16 storage: recall@10 against the f32 oracle must stay high
        assert len(set(got_ids) & set(oracle_rows.tolist())) >= 9


def test_searcher_source_filter_and_tombstones():
    rng = np.random.default_rng(2)
    n = 500
    vecs = _rand_vecs(rng, n)
    s = Searcher(0, 0, DIM, engine="xla")
    sources = ([1] * 250) + ([2] * 250)
    s.upsert_embeddings(range(n), sources, vecs)

    q = vecs[300]  # an item from source 2
    top = s.search_vector(q, 5, source_ids=[2])
    assert top[0][0] == 300
    assert all(250 <= iid < 500 for iid, _ in top)

    only_1 = s.search_vector(q, 5, source_ids=[1])
    assert all(iid < 250 for iid, _ in only_1)

    # tombstone the best match; it must vanish from results
    s.remove_items([300])
    top2 = s.search_vector(q, 5, source_ids=[2])
    assert 300 not in [iid for iid, _ in top2]


def test_searcher_batch_queries():
    rng = np.random.default_rng(3)
    n = 400
    vecs = _rand_vecs(rng, n)
    s = Searcher(0, 0, DIM, engine="xla")
    s.upsert_embeddings(range(n), [1] * n, vecs)
    qs = vecs[[10, 20, 30]]
    res = s.search_vectors_batch(qs, 3)
    assert [r[0][0] for r in res] == [10, 20, 30]


def test_searcher_k_larger_than_rows():
    rng = np.random.default_rng(4)
    vecs = _rand_vecs(rng, 5)
    s = Searcher(0, 0, DIM, engine="xla")
    s.upsert_embeddings(range(5), [1] * 5, vecs)
    got = s.search_vector(vecs[0], 20)
    assert len(got) == 5
    assert got[0][0] == 0


def test_searcher_empty():
    s = Searcher(0, 0, DIM, engine="xla")
    assert s.search_vector(np.zeros(DIM, np.float32), 10) == []


def test_build_and_rebuild_from_db(tmp_db):
    rng = np.random.default_rng(5)
    src1 = add_source(tmp_db, Source(name="a", location="x", config={"type": "fs"}))
    src2 = add_source(tmp_db, Source(name="b", location="y", config={"type": "fs"}))
    vecs = _rand_vecs(rng, 6)
    with tmp_db.write() as conn:
        ids = []
        for i in range(6):
            sid = src1.id if i < 3 else src2.id
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?, ?, '', 'c')",
                (sid, f"doc{i}"),
            )
            ids.append(cur.lastrowid)
            conn.execute(
                """INSERT INTO item_embeddings
                   (model_id, model_version, item_id, item_index_version, embedding)
                   VALUES (0, 0, ?, 1, ?)""",
                (ids[-1], serialize_embedding(vecs[i])),
            )
        # one hidden + one skipped item that must NOT load
        conn.execute("UPDATE items SET hidden_at = 1 WHERE id = ?", (ids[0],))
        conn.execute("UPDATE items SET skipped = 'not_found' WHERE id = ?", (ids[1],))

    s = Searcher.build(tmp_db, 0, 0, DIM, engine="xla")
    assert len(s.matrix) == 4

    top = s.search_vector(vecs[2], 3)
    assert top[0][0] == ids[2]

    # retrieve joins back to items + source names
    results = s.search_vector_and_retrieve(tmp_db, vecs[2], 3)
    assert results[0].item.external_id == "doc2"
    assert results[0].source_name == "a"

    # rebuild one source after deleting an item's embedding
    with tmp_db.write() as conn:
        conn.execute("DELETE FROM item_embeddings WHERE item_id = ?", (ids[5],))
    n = s.rebuild_source(tmp_db, src2.id)
    assert n == 2  # doc3 + doc4 remain for source b (doc5's embedding deleted)
    assert s.stored_embedding(tmp_db, ids[2]) is not None
    assert s.stored_embedding(tmp_db, ids[5]) is None


def test_snapshot_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    vecs = _rand_vecs(rng, 100)
    m = EmbeddingMatrix(DIM)
    m.upsert(range(100), [3] * 100, vecs)
    m.remove([7])
    p = str(tmp_path / "snap.npz")
    m.save_snapshot(p)
    m2 = EmbeddingMatrix.load_snapshot(p)
    assert len(m2) == 99
    assert 7 not in m2.row_of
    np.testing.assert_allclose(
        m2._host_vectors[m2.row_of[42], :DIM], vecs[42], rtol=1e-6
    )


def test_recall_at_10_parity():
    """Recall@10 harness (SURVEY.md §4): bf16 exact scan vs f32 brute force
    on a unit-norm random corpus.  Exact scan is parity-by-construction; the
    only divergence source is bf16 rounding of near-ties, so recall stays
    ~1.0 (HNSW-class ANN baselines sit well below that on worst-case data)."""
    rng = np.random.default_rng(123)
    n, d, k, n_queries = 5000, 64, 10, 20
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = list(range(1, n + 1))

    s = Searcher(0, 0, d)  # default bf16 storage
    s.upsert_embeddings(ids, [0] * n, vecs)

    hits = total = 0
    for qi in range(n_queries):
        q = rng.standard_normal(d).astype(np.float32)
        q /= np.linalg.norm(q)
        truth = set((np.argsort(-(vecs @ q))[:k] + 1).tolist())
        got = {i for i, _ in s.search_vector(q, k)}
        hits += len(got & truth)
        total += k
    assert hits / total >= 0.95, hits / total


def test_auto_matrix_dtype_scales_with_dim():
    """Tier thresholds are BYTES crossovers measured at 384-d: a 768-d
    model must cross each one at half the rows (the default flagship
    MsMarcoBertBaseDotV5 embeds at 768-d)."""
    import jax.numpy as jnp

    from perceive_tpu.index.matrix import INT2, INT4, auto_matrix_dtype

    assert auto_matrix_dtype(1_000_000, 768) == jnp.int8  # 2M eff rows
    assert auto_matrix_dtype(1_000_000, 384) == jnp.bfloat16
    assert auto_matrix_dtype(3_000_000, 768) == INT2  # 6M eff
    assert auto_matrix_dtype(13_000_000, 768) == INT4  # 26M eff
    assert auto_matrix_dtype(13_000_000, 384) == INT2
