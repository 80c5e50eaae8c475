"""Fused text search: encode + first sweep in ONE compiled dispatch
(VERDICT r2 #1 — the serving hot path must not pay a device round trip per
stage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.index.matrix import INT2, INT4
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import (
    EncoderArch,
    HeadConfig,
    Model,
    TextTokenizer,
    tiny_test_vocab,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta music pizza".split()


@pytest.fixture(scope="module")
def model():
    vocab = tiny_test_vocab(WORDS)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=2, num_heads=4,
                       intermediate_size=64, max_position_embeddings=32)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=3)
    m.model_id = 0
    return m


@pytest.fixture(scope="module")
def corpus(model):
    rng = np.random.default_rng(0)
    texts = [" ".join(rng.choice(WORDS, size=6)) for _ in range(300)]
    vecs = model.encode(texts)
    srcs = [i % 3 for i in range(len(texts))]
    return texts, vecs, srcs


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.int8, INT4, INT2])
def test_fused_matches_two_dispatch_path(model, corpus, dtype):
    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=dtype, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    for query in ("music pizza", "alpha", "zeta eta theta"):
        want = s.search(model, query, 7)
        got = s.search_fused(model, query, 7)
        assert [i for i, _ in got] == [i for i, _ in want]
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in want], rtol=1e-5
        )
    # filters flow through the fused sweep too
    want = s.search(model, "music", 5, source_ids=[1])
    got = s.search_fused(model, "music", 5, source_ids=[1])
    assert [i for i, _ in got] == [i for i, _ in want]
    # empty filter matches nothing; oversized filter falls back, still correct
    assert s.search_fused(model, "music", 5, source_ids=[]) == []
    many = list(range(0, 20))
    assert [i for i, _ in s.search_fused(model, "music", 5, source_ids=many)] == [
        i for i, _ in s.search(model, "music", 5, source_ids=many)
    ]


def test_fused_is_single_dispatch(model, corpus, monkeypatch):
    """Structural proof of one device round trip for encode+sweep: with the
    separate encode and the separate sweep both booby-trapped, the fused
    path still answers (nothing but the fused program ran)."""
    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    want = s.search(model, "music pizza", 5)
    s.search_fused(model, "music pizza", 5)  # compile before the traps

    def boom(*a, **k):
        raise AssertionError("separate dispatch used on the fused path")

    monkeypatch.setattr(Model, "encode_query", boom)
    monkeypatch.setattr(Searcher, "_device_scan", boom)
    got = s.search_fused(model, "music pizza", 5)
    assert [i for i, _ in got] == [i for i, _ in want]
    with pytest.raises(AssertionError):
        s.search(model, "music pizza", 5)  # the traps do fire off-path


def test_fused_escalation_still_exact(model):
    """A quantized tier whose fused sweep can't prove the top-k escalates
    through the normal path and stays exact (same guarantee as search)."""
    rng = np.random.default_rng(1)
    d = model.dim
    n = 400
    base = rng.standard_normal((1, d)).astype(np.float32)
    # clustered corpus: quantized scores collapse, forcing deep fetches
    vecs = base + 0.001 * rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    s = Searcher(0, 0, d, dtype=INT4, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    q = model.encode_query("music pizza")
    want = s.search_vector(q, 10)
    got = s.search_fused(model, "music pizza", 10)
    assert [i for i, _ in got] == [i for i, _ in want]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8, INT4])
def test_sharded_searcher_fused(model, corpus, dtype, monkeypatch):
    """The mesh searcher fuses too: encode + shard_map scan + all_gather
    merge in one program, same results as the two-dispatch path."""
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    texts, vecs, srcs = corpus
    mesh = make_mesh(4)
    ss = ShardedSearcher(0, 0, model.dim, mesh, dtype=dtype)
    ss.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    want = ss.search(model, "music pizza", 5)
    got = ss.search_fused(model, "music pizza", 5)
    assert [i for i, _ in got] == [i for i, _ in want]
    np.testing.assert_allclose([v for _, v in got], [v for _, v in want], rtol=1e-5)
    # filtered too
    wantf = ss.search(model, "alpha", 5, source_ids=[1])
    gotf = ss.search_fused(model, "alpha", 5, source_ids=[1])
    assert [i for i, _ in gotf] == [i for i, _ in wantf]
    if dtype == jnp.float32:
        # structural single-dispatch proof on the mesh (escalation-free tier)
        ss.search_fused(model, "zeta eta", 5)  # compile before the traps

        def boom(*a, **k):
            raise AssertionError("separate dispatch used on the fused path")

        monkeypatch.setattr(Model, "encode_query", boom)
        from perceive_tpu.index.searcher import Searcher

        monkeypatch.setattr(Searcher, "_device_scan", boom)
        monkeypatch.setattr(ShardedSearcher, "_device_scan", boom)
        hits = ss.search_fused(model, "zeta eta", 5)
        assert hits


def test_executor_text_path(model, corpus):
    """submit_text: an uncontended text query answers through the fused
    program; a concurrent burst batch-encodes once and coalesces sweeps."""
    import threading

    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    ex = BatchingSearchExecutor(s, model=model, window_ms=25)
    try:
        want = s.search(model, "music pizza", 5)
        got = ex.search_text("music pizza", 5, timeout=30)
        assert [i for i, _ in got] == [i for i, _ in want]

        # concurrent burst of text queries
        queries = [" ".join([WORDS[i % len(WORDS)], "music"]) for i in range(12)]
        results = [None] * len(queries)
        barrier = threading.Barrier(len(queries))

        def client(i):
            barrier.wait()
            results[i] = ex.search_text(queries[i], 5, timeout=30)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, hits in enumerate(results):
            want = s.search(model, queries[i], 5)
            assert [h[0] for h in hits] == [w[0] for w in want]
    finally:
        ex.close()


def test_executor_mixed_text_and_vector_batch(model, corpus):
    """Text and vector queries submitted into the SAME coalescing window
    resolve correctly: texts batch-encode once, then share sweeps with the
    vector requests by (k, filter) signature."""
    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    ex = BatchingSearchExecutor(s, model=model, window_ms=60)
    try:
        ex.search(vecs[0], 3)  # prime: disables the idle short-circuit
        fs = [
            ex.submit_text("music pizza", 5),
            ex.submit(vecs[3], 5),
            ex.submit_text("alpha beta", 5, source_ids=[0]),
            ex.submit(vecs[7], 3),
        ]
        got = [f.result(30) for f in fs]
        assert [i for i, _ in got[0]] == [i for i, _ in s.search(model, "music pizza", 5)]
        assert [i for i, _ in got[1]] == [i for i, _ in s.search_vector(vecs[3], 5)]
        assert [i for i, _ in got[2]] == [
            i for i, _ in s.search(model, "alpha beta", 5, source_ids=[0])
        ]
        assert [i for i, _ in got[3]] == [i for i, _ in s.search_vector(vecs[7], 3)]
    finally:
        ex.close()


def test_executor_without_model_rejects_text(corpus, model):
    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings([1], [0], vecs[:1])
    ex = BatchingSearchExecutor(s)
    try:
        with pytest.raises(RuntimeError):
            ex.submit_text("q", 5)
    finally:
        ex.close()


def test_sharded_searcher_fused_aux(model, corpus, monkeypatch):
    """aux (highlights-model) query encode rides the MESH fused program too:
    the aux params replicate onto the mesh once, the embedding matches a
    separate encode, and no separate encode dispatch runs."""
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    texts, vecs, srcs = corpus
    aux = Model.random(
        EncoderArch(vocab_size=len(tiny_test_vocab(WORDS)), hidden_size=32,
                    num_layers=1, num_heads=4, intermediate_size=64,
                    max_position_embeddings=32),
        HeadConfig(pooling="mean", normalize=True),
        TextTokenizer.from_vocab(tiny_test_vocab(WORDS), max_seq_length=32),
        seed=11,
    )
    aux.model_id = 1
    mesh = make_mesh(4)
    ss = ShardedSearcher(0, 0, model.dim, mesh, dtype=jnp.float32)
    ss.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)

    want = ss.search_fused(model, "music pizza", 5)
    want_aq = aux.encode_query("music pizza")
    hits, aq = ss.search_fused(model, "music pizza", 5, aux_model=aux)
    assert hits == want
    np.testing.assert_allclose(aq, want_aq, rtol=2e-5, atol=2e-6)
    # the replicated param copy is cached (one slot, keyed by weakref)
    first = ss._aux_repl
    assert first is not None and first[0]() is aux

    def boom(*a, **k):
        raise AssertionError("separate aux encode used on the mesh fused path")

    monkeypatch.setattr(Model, "encode_query", boom)
    monkeypatch.setattr(Model, "encode", boom)
    hits2, aq2 = ss.search_fused(model, "music pizza", 5, aux_model=aux)
    assert hits2 == want
    np.testing.assert_allclose(aq2, aq)
    assert ss._aux_repl is first  # not re-replicated per call


def test_executor_result_cache(model, corpus):
    """A repeat text query on an UNCHANGED corpus answers from the result
    cache with zero device sweeps; any matrix mutation invalidates it."""
    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    ex = BatchingSearchExecutor(s, model=model, window_ms=5)
    try:
        first = ex.search_text("music pizza", 5, timeout=30)
        sweeps0 = ex.sweeps_total
        again = ex.search_text("music pizza", 5, timeout=30)
        assert again == first
        assert ex.sweeps_total == sweeps0  # answered without device work
        assert ex.result_cache_hits == 1

        # a caller mutating its hits list must not corrupt the cache
        again.append(("junk", 0.0))
        assert ex.search_text("music pizza", 5, timeout=30) == first

        # (query, k, filter) are distinct entries
        assert len(ex.search_text("music pizza", 3, timeout=30)) == 3
        filt = ex.search_text("music pizza", 5, source_ids=[1], timeout=30)
        assert filt == s.search(model, "music pizza", 5, source_ids=[1])

        # corpus mutation invalidates: the next repeat re-sweeps
        s.upsert_embeddings([len(texts) + 1], [0], vecs[:1])
        sweeps1 = ex.sweeps_total
        fresh = ex.search_text("music pizza", 5, timeout=30)
        assert ex.sweeps_total == sweeps1 + 1
        assert fresh == s.search(model, "music pizza", 5)
    finally:
        ex.close()


def test_executor_result_cache_want_aux(model, corpus):
    texts, vecs, srcs = corpus
    from perceive_tpu.index import BatchingSearchExecutor

    aux = Model.random(
        EncoderArch(vocab_size=len(tiny_test_vocab(WORDS)), hidden_size=32,
                    num_layers=1, num_heads=4, intermediate_size=64,
                    max_position_embeddings=32),
        HeadConfig(pooling="mean", normalize=True),
        TextTokenizer.from_vocab(tiny_test_vocab(WORDS), max_seq_length=32),
        seed=11,
    )
    aux.model_id = 1
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    ex = BatchingSearchExecutor(s, model=model, aux_model=aux, window_ms=5)
    try:
        hits, aq = ex.search_text("music", 5, want_aux=True, timeout=30)
        sweeps0 = ex.sweeps_total
        h2, aq2 = ex.search_text("music", 5, want_aux=True, timeout=30)
        assert h2 == hits
        np.testing.assert_allclose(aq2, aq)
        assert ex.sweeps_total == sweeps0
        # want_aux and plain entries don't cross-serve
        plain = ex.search_text("music", 5, timeout=30)
        assert plain == hits
    finally:
        ex.close()


def test_executor_result_cache_disabled(model, corpus, monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_RESULT_CACHE", "0")
    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs, srcs = corpus
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), srcs, vecs)
    ex = BatchingSearchExecutor(s, model=model, window_ms=5)
    try:
        a = ex.search_text("music pizza", 5, timeout=30)
        sweeps0 = ex.sweeps_total
        b = ex.search_text("music pizza", 5, timeout=30)
        assert b == a
        assert ex.sweeps_total == sweeps0 + 1  # no cache: re-swept
        assert ex.result_cache_hits == 0
    finally:
        ex.close()
