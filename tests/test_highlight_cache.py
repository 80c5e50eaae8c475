"""Highlight chunk cache + fused aux query encode.

The serving highlight path's device work is (a) the query embedded by the
highlights model and (b) the result documents' chunk embeddings.  Round 3
moves (a) into the fused search dispatch (searcher.search_fused aux_model)
and caches (b) per document (models/highlight.HighlightCache), so a warm
query's highlight is pure host numpy — zero device dispatches.  These tests
pin the cache's correctness (identical output, content invalidation,
eviction bound) and the aux embedding's equivalence to a separate encode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import (
    EncoderArch,
    HeadConfig,
    Model,
    TextTokenizer,
    tiny_test_vocab,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta music pizza".split()


def make_model(seed=3, max_seq=32):
    vocab = tiny_test_vocab(WORDS)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=max_seq)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1,
                       num_heads=4, intermediate_size=64,
                       max_position_embeddings=max_seq)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=seed)
    m.model_id = 0
    return m


@pytest.fixture(scope="module")
def model():
    return make_model()


@pytest.fixture(scope="module")
def docs():
    rng = np.random.default_rng(7)
    return [" ".join(rng.choice(WORDS, size=30)) for _ in range(6)]


def count_encodes(model, monkeypatch):
    """Wrap encode_token_batch with a call counter (every highlight device
    dispatch goes through it)."""
    calls = []
    orig = model.encode_token_batch
    monkeypatch.setattr(
        model, "encode_token_batch", lambda tb: (calls.append(1), orig(tb))[1]
    )
    return calls


def test_cache_warm_highlight_is_identical_and_dispatch_free(model, docs, monkeypatch):
    qemb = model.encode_query("music pizza")
    cold = model.highlight("music pizza", docs, query_emb=qemb)
    assert any(h is not None for h in cold)

    calls = count_encodes(model, monkeypatch)
    warm = model.highlight("music pizza", docs, query_emb=qemb)
    assert warm == cold
    assert calls == []  # all docs cached + query embedding supplied -> no device work

    # without the supplied query embedding, exactly one dispatch (the query
    # rides an otherwise-empty chunk batch)
    warm2 = model.highlight("music pizza", docs)
    assert warm2 == cold
    assert len(calls) == 1


def test_cache_invalidates_on_content_change(model, docs, monkeypatch):
    qemb = model.encode_query("alpha beta")
    model.highlight("alpha beta", docs, query_emb=qemb)  # fill
    calls = count_encodes(model, monkeypatch)
    changed = [docs[0] + " zeta", *docs[1:]]
    model.highlight("alpha beta", changed, query_emb=qemb)
    assert len(calls) == 1  # the edited doc re-encoded; the rest hit


def test_cache_eviction_bound(monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_HIGHLIGHT_CACHE_DOCS", "3")
    m = make_model(seed=5)
    qemb = m.encode_query("alpha")
    rng = np.random.default_rng(1)
    many = [" ".join(rng.choice(WORDS, size=25)) for _ in range(8)]
    m.highlight("alpha", many, query_emb=qemb)
    assert len(m._highlight_cache) == 3
    assert m._highlight_cache.max_docs == 3


def test_cache_disabled(monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_HIGHLIGHT_CACHE_DOCS", "0")
    m = make_model(seed=6)
    qemb = m.encode_query("alpha")
    doc = ["alpha beta gamma delta epsilon zeta eta theta music pizza " * 3]
    a = m.highlight("alpha", doc, query_emb=qemb)
    calls = count_encodes(m, monkeypatch)
    b = m.highlight("alpha", doc, query_emb=qemb)
    assert a == b
    assert len(calls) == 1  # no cache -> chunks re-encode every call
    assert m._highlight_cache is False


def test_mixed_hit_miss_batch(model, monkeypatch):
    """One request mixing cached and new documents encodes ONLY the new
    ones, and the snippets match a cache-cold run."""
    rng = np.random.default_rng(11)
    a = [" ".join(rng.choice(WORDS, size=28)) for _ in range(3)]
    b = [" ".join(rng.choice(WORDS, size=28)) for _ in range(3)]
    qemb = model.encode_query("zeta eta")
    cold_all = model.highlight("zeta eta", a + b, query_emb=qemb)
    fresh = make_model(seed=3)  # same weights (same seed) but cold cache
    assert fresh.highlight("zeta eta", a + b, query_emb=qemb) == cold_all
    calls = count_encodes(model, monkeypatch)
    again = model.highlight("zeta eta", a + b, query_emb=qemb)
    assert again == cold_all and calls == []


# -- fused aux query encode ---------------------------------------------------


@pytest.fixture(scope="module")
def corpus(model):
    rng = np.random.default_rng(0)
    texts = [" ".join(rng.choice(WORDS, size=6)) for _ in range(200)]
    vecs = model.encode(texts)
    return texts, vecs


def test_search_fused_aux_embedding_matches_separate_encode(model, corpus):
    texts, vecs = corpus
    aux = make_model(seed=9)  # a distinct "highlights model"
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), [0] * len(texts), vecs)
    for query in ("music pizza", "alpha beta gamma"):
        plain = s.search_fused(model, query, 5)
        hits, aq = s.search_fused(model, query, 5, aux_model=aux)
        assert hits == plain
        np.testing.assert_allclose(aq, aux.encode_query(query), rtol=2e-5, atol=2e-6)


def test_search_fused_aux_single_dispatch(model, corpus, monkeypatch):
    """With the separate aux encode booby-trapped, the aux-fused path still
    returns the aux embedding — it was computed inside the fused program."""
    texts, vecs = corpus
    aux = make_model(seed=9)
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), [0] * len(texts), vecs)
    hits, aq = s.search_fused(model, "music", 5, aux_model=aux)  # compile first

    def boom(*a, **k):
        raise AssertionError("separate aux encode used on the fused path")

    monkeypatch.setattr(Model, "encode_query", boom)
    monkeypatch.setattr(Model, "encode", boom)
    hits2, aq2 = s.search_fused(model, "music", 5, aux_model=aux)
    assert hits2 == hits
    np.testing.assert_allclose(aq2, aq)


def test_search_fused_aux_empty_returns_none(model):
    aux = make_model(seed=9)
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    assert s.search_fused(model, "music", 5, aux_model=aux) == ([], None)


def test_executor_want_aux_paths(model, corpus):
    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs = corpus
    aux = make_model(seed=9)
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), [0] * len(texts), vecs)
    ex = BatchingSearchExecutor(s, model=model, aux_model=aux)
    try:
        # uncontended: fused single dispatch
        hits, aq = ex.search_text("music pizza", 5, want_aux=True)
        assert hits == s.search_fused(model, "music pizza", 5)
        np.testing.assert_allclose(aq, aux.encode_query("music pizza"), rtol=2e-5, atol=2e-6)
        # coalesced: many concurrent want_aux queries share batched encodes
        futs = [
            ex.submit_text(q, 3, want_aux=True)
            for q in ("alpha", "beta gamma", "music", "pizza zeta", "eta theta")
            for _ in range(3)
        ]
        for f in futs:
            hits, aq = f.result(30)
            assert isinstance(hits, list) and aq is not None and aq.shape == (model.dim,)
    finally:
        ex.close()


def test_cache_byte_budget():
    """The LRU evicts to a byte budget too — a few huge documents must not
    pin unbounded host RAM (and an entry over the whole budget is never
    cached)."""
    from perceive_tpu.models.highlight import HighlightCache

    c = HighlightCache(max_docs=100, max_bytes=10_000)
    big = np.zeros((6, 100), np.float32)  # 2400 B each
    for i in range(6):
        c.put(("k", i), ([(0, 1)] * 6, big))
    assert c.nbytes <= 10_000 and len(c) == 4
    assert c.get(("k", 0)) is None and c.get(("k", 5)) is not None

    c.put(("huge",), ([], np.zeros((100, 100), np.float32)))  # 40 KB > budget
    assert c.get(("huge",)) is None
    # re-putting an existing key replaces, not double-counts
    c.put(("k", 5), ([(0, 1)] * 6, big))
    assert c.nbytes <= 10_000


def test_precompute_chunks_fills_cache(model, monkeypatch):
    from perceive_tpu.models.highlight import precompute_chunks

    rng = np.random.default_rng(21)
    docs = [" ".join(rng.choice(WORDS, size=26)) for _ in range(5)]
    assert precompute_chunks(model, docs) == 5
    assert precompute_chunks(model, docs) == 0  # all cached now
    assert precompute_chunks(model, ["", docs[0], docs[0]]) == 0  # empty+dup skip

    qemb = model.encode_query("music")
    calls = count_encodes(model, monkeypatch)
    out = model.highlight("music", docs, query_emb=qemb)
    assert calls == []  # first-ever highlight of these docs: no device work
    assert any(h is not None for h in out)


def test_precompute_stops_at_byte_budget():
    from perceive_tpu.models.highlight import HighlightCache, precompute_chunks

    m = make_model(seed=13)
    m._highlight_cache = HighlightCache(10_000, max_bytes=2_000)
    rng = np.random.default_rng(3)
    docs = [" ".join(rng.choice(WORDS, size=26)) for _ in range(300)]
    done = precompute_chunks(m, docs)
    assert 0 < done < 300  # stopped early at the budget
    assert m._highlight_cache.nbytes <= m._highlight_cache.max_bytes


def test_serve_warms_highlight_cache(tmp_path):
    """ServeState pre-fills the chunk cache in the background after
    readiness (most recently accessed items first)."""
    import time as _time

    from perceive_tpu.cli import AppState
    from perceive_tpu.db import add_source
    from perceive_tpu.serve import start_server
    from perceive_tpu.sources import scan_source
    from perceive_tpu.types import Source

    model = make_model(seed=3)
    app = AppState(str(tmp_path / "db.sqlite3"), model=model, engine="xla")
    try:
        docs = tmp_path / "docs"
        docs.mkdir()
        rng = np.random.default_rng(5)
        for i in range(7):
            (docs / f"d{i}.txt").write_text(" ".join(rng.choice(WORDS, 24)))
        src = add_source(app.db, Source(name="w", config={"type": "fs"}, location=str(docs)))
        scan_source(app.db, app.model, src, on_embeddings=app.searcher.upsert_embeddings)

        server = start_server(lambda: app, port=0)
        holder = server.perceive_state
        try:
            holder.ready.wait(120)
            deadline = _time.time() + 60
            while _time.time() < deadline and holder.highlight_warmed_total < 7:
                _time.sleep(0.1)
            assert holder.highlight_warmed_total == 7
            # >= 7: ServeState._warm's jit-warmup documents cache too
            assert len(app.highlights_model._highlight_cache) >= 7
        finally:
            holder.stop()
            server.shutdown()
    finally:
        app.close()


def test_cache_entries_own_their_memory(model, docs):
    """Cached chunk embeddings must be copies, not slice views into the
    batch's concatenated encode — a view pins the whole base array while
    nbytes counts only the slice, defeating the byte budget."""
    model.highlight("music", docs, query_emb=model.encode_query("music"))
    c = model._highlight_cache
    assert len(c) > 0
    for _, (_, embs) in c._entries.items():
        assert embs.base is None


def test_batch_dedupes_repeated_miss_docs(model, monkeypatch):
    """Coalesced requests sharing an uncached document encode its chunks
    ONCE per batch, not once per occurrence."""
    from perceive_tpu.models.highlight import highlight_batch

    rng = np.random.default_rng(31)
    doc = " ".join(rng.choice(WORDS, size=40))
    qemb = model.encode_query("alpha")

    windows = []
    orig = model.tokenizer.encode_token_chunks
    monkeypatch.setattr(
        model.tokenizer, "encode_token_chunks",
        lambda ch: (windows.extend(ch), orig(ch))[1],
    )
    out = highlight_batch(
        model, [("alpha", [doc]), ("alpha", [doc]), ("alpha", [doc, doc])],
        [qemb, qemb, qemb],
    )
    # one doc's worth of chunk windows encoded, shared by all four slots
    fresh = make_model(seed=3)
    solo = fresh.highlight("alpha", [doc], query_emb=qemb)
    assert out == [solo, solo, solo + solo]
    # exactly the doc's own chunk count was encoded (once), matching the
    # single cached entry — not 4x it
    (_, embs), = list(model._highlight_cache._entries.values())[-1:]
    assert len(windows) == embs.shape[0] > 0


def test_executor_aux_failure_degrades_not_fails(model, corpus, monkeypatch):
    """In a coalesced drain, an aux-encode failure must not fail searches:
    non-aux requests resolve normally, want_aux requests get aux=None."""
    from perceive_tpu.index import BatchingSearchExecutor

    texts, vecs = corpus
    aux = make_model(seed=9)
    s = Searcher(0, 0, model.dim, dtype=jnp.float32, engine="xla")
    s.upsert_embeddings(list(range(1, len(texts) + 1)), [0] * len(texts), vecs)
    ex = BatchingSearchExecutor(s, model=model, aux_model=aux, window_ms=50.0)
    try:
        def boom(*a, **k):
            raise RuntimeError("aux device gone")

        monkeypatch.setattr(aux, "encode", boom)
        # two concurrent requests force the coalesced path (window 50 ms)
        f1 = ex.submit_text("music", 3, want_aux=True)
        f2 = ex.submit_text("pizza", 3)
        hits1, aq1 = f1.result(30)
        hits2 = f2.result(30)
        assert hits1 and aq1 is None  # degraded, not failed
        assert hits2
        assert ex.query_errors_total == 0
    finally:
        ex.close()


def test_batch_resolves_shared_slot_to_single_put(model, monkeypatch):
    """A dup-miss document shared by N coalesced requests is cache.put()
    exactly ONCE per batch — the first request resolves the shared slot to
    a hit in place; the rest reuse the tuple (review r3: each referencing
    request used to re-slice and re-put identical contents under the cache
    lock)."""
    import importlib

    hl = importlib.import_module("perceive_tpu.models.highlight")
    rng = np.random.default_rng(37)
    doc = " ".join(rng.choice(WORDS, size=40))
    qemb = model.encode_query("alpha")
    cache = hl._cache_for(model)
    puts = []
    orig_put = cache.put
    monkeypatch.setattr(
        cache, "put", lambda key, val: (puts.append(key), orig_put(key, val))[1]
    )
    out = hl.highlight_batch(
        model, [("alpha", [doc]), ("alpha", [doc]), ("alpha", [doc, doc])],
        [qemb, qemb, qemb],
    )
    assert len(puts) == 1, f"shared miss slot re-put {len(puts)} times"
    assert out[0] == out[1] == [out[2][0]] and out[2][0] == out[2][1]
