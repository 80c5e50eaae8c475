"""Concurrency stress: searches run WHILE a scan streams vectors into the
device matrix — no crashes, no lost rows, coherent results (the matrix RLock
+ single-writer SQLite discipline under real thread pressure)."""

import threading

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab
from perceive_tpu.sources import scan_source
from perceive_tpu.types import Source


@pytest.fixture(scope="module")
def model():
    words = "alpha beta gamma delta epsilon zeta".split()
    vocab = tiny_test_vocab(words)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=16)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=16)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=9)
    m.model_id = 0
    return m


def test_search_during_scan(tmp_db, tmp_path, model):
    root = tmp_path / "docs"
    root.mkdir()
    words = "alpha beta gamma delta epsilon zeta".split()
    n_docs = 120
    for i in range(n_docs):
        (root / f"d{i:03d}.txt").write_text(" ".join(words[j % 6] for j in range(i, i + 4)))
    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location=str(root)))

    searcher = Searcher(0, 0, model.dim, engine="xla")
    stop = threading.Event()
    errors: list = []
    queries_done = [0]

    def hammer():
        rng = np.random.default_rng(0)
        while not stop.is_set():
            try:
                q = rng.standard_normal(model.dim).astype(np.float32)
                hits = searcher.search_vector(q, 5)
                for iid, score in hits:
                    assert iid > 0 and np.isfinite(score)
                queries_done[0] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        stats, ok = scan_source(
            tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=8
        )
    finally:
        stop.set()
        for t in threads:
            t.join()

    assert not errors, errors[:1]
    assert ok and stats.added.value == n_docs
    assert len(searcher.matrix) == n_docs
    assert queries_done[0] > 0
    # post-scan results complete and coherent
    q = np.ones(model.dim, np.float32)
    hits = searcher.search_vector(q, 10)
    assert len(hits) == 10


def test_tokenizer_concurrent_modes(model):
    """Concurrent truncated encodes + untruncated highlight tokenization must
    not crash (HF Rust tokenizer setters take &mut self) or leak modes."""
    errors = []
    long_text = "alpha beta gamma delta " * 40  # > max_seq_length tokens

    def truncated():
        try:
            for _ in range(30):
                tb = model.tokenizer.encode_batch([long_text, "alpha"])
                assert tb.input_ids.shape[1] <= model.tokenizer.max_seq_length
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def untruncated():
        try:
            for _ in range(30):
                encs = model.tokenizer.encode_untruncated([long_text])
                assert len(encs[0].ids) > model.tokenizer.max_seq_length
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=f)
        for f in (truncated, untruncated, truncated, untruncated)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:1]


def test_serve_under_concurrent_load(tmp_path, model):
    """32 concurrent HTTP searches against a 50k-vector index: every request
    succeeds through the coalescing executor with coherent results."""
    import json
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from perceive_tpu.cli import AppState
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.serve import start_server
    from perceive_tpu.types import Source

    st = AppState(str(tmp_path / "load.sqlite3"), model=model, engine="xla",
                  build_searcher=False)
    src = add_source(st.db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(0)
    n = 50_000
    vecs = rng.standard_normal((n, model.dim)).astype(np.float32)
    with st.db.write() as conn:
        conn.executemany(
            "INSERT INTO items (id, source_id, external_id, hash, content) VALUES (?,?,?,?,?)",
            [(i + 1, src.id, f"d{i}", "", f"doc {i} alpha beta") for i in range(n)],
        )
        conn.executemany(
            """INSERT INTO item_embeddings
                 (item_id, item_index_version, embedding, model_id, model_version, seq)
               VALUES (?,?,?,0,0,?)""",
            [(i + 1, 1, serialize_embedding(vecs[i]), i + 1) for i in range(n)],
        )
    from perceive_tpu.index.searcher import Searcher

    st.searcher = Searcher.build(st.db, 0, 0, model.dim, engine="xla", use_snapshot=False)
    assert len(st.searcher.matrix) == n

    server = start_server(lambda: st, port=0)
    port = server.server_address[1]
    try:
        import time as _t

        for _ in range(200):  # builder + jit warmup gate readiness
            _t.sleep(0.2)
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/status") as r:
                if json.loads(r.read())["model_loaded"]:
                    break

        def one(i):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q=alpha+beta+doc&k=5", timeout=30
            ) as r:
                return json.loads(r.read())

        with ThreadPoolExecutor(max_workers=32) as pool:
            results = list(pool.map(one, range(32)))
        assert all(len(r) == 5 for r in results)
        first = [h["id"] for h in results[0]]
        assert all([h["id"] for h in r] == first for r in results)  # coherent
    finally:
        server.shutdown()
        st.close()


def test_search_under_row_churn_stress():
    """Continuous searches against a matrix whose rows churn (remove +
    upsert reusing freed slots) must never crash, misattribute a recycled
    row, or return tombstoned items — the reuse_gen retry protocol under
    real thread interleaving (int8 tier exercises the rerank path too)."""
    import threading

    import jax.numpy as jnp
    import numpy as np

    from perceive_tpu.index.searcher import Searcher

    rng = np.random.default_rng(0)
    n, d = 600, 32
    base = rng.standard_normal((n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, base)

    stop = threading.Event()
    errors: list = []
    # ids 1..100 churn: killed and replaced by fresh ids forever
    next_id = [n + 1]

    def churn():
        try:
            batch = list(range(1, 101))
            while not stop.is_set():
                s.remove_items(batch)
                fresh = list(range(next_id[0], next_id[0] + 100))
                next_id[0] += 100
                vecs = rng.standard_normal((100, d)).astype(np.float32)
                vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
                s.upsert_embeddings(fresh, [0] * 100, vecs)
                batch = fresh
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    stable = set(range(101, n + 1))  # never-churned ids

    def search():
        try:
            q = base[200]  # a stable row's vector
            for _ in range(60):
                hits = s.search_vector(q, 10)
                assert hits, "search returned nothing"
                # the stable self-match must always win with ~1.0 score
                assert hits[0][0] == 201, f"expected stable item 201, got {hits[0]}"
                assert hits[0][1] > 0.95
                for iid, score in hits:
                    assert np.isfinite(score)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=churn)
    searchers = [threading.Thread(target=search) for _ in range(3)]
    t1.start()
    for t in searchers:
        t.start()
    for t in searchers:
        t.join(timeout=120)
    stop.set()
    t1.join(timeout=30)
    assert not errors, errors


def test_full_component_storm(tmp_path):
    """Cross-component soak: concurrent ingest churn, searches, snapshot
    autosaves, and auto-retier flips (int8 <-> int2, which restages the
    matrix and re-runs the coarse audit) for a few seconds — nothing may
    raise, every search result must be well-formed, and after quiescing
    the index must answer exactly (anchors still present, oracle top-1).

    This interleaves the lock-order-sensitive paths that the per-feature
    tests exercise separately: device_view capture/donate, snapshot's
    chunked writes, retier's full restage, and the audit's sampled
    sweeps."""
    import threading
    import time as _t

    import jax.numpy as jnp

    from perceive_tpu.index.matrix import INT2
    from perceive_tpu.index.searcher import Searcher

    rng = np.random.default_rng(77)
    d = 64
    n_anchor = 512
    anchors = rng.standard_normal((n_anchor, d)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)

    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    s.upsert_embeddings(list(range(1, n_anchor + 1)), [0] * n_anchor, anchors)

    stop = _t.time() + 6.0
    errors: list = []
    churn_base = 10_000

    def guard(fn):
        def run():
            try:
                while _t.time() < stop:
                    fn()
            except Exception as e:  # noqa: BLE001
                errors.append(e)
        return run

    cr = np.random.default_rng(1)

    def churn():
        ids = (churn_base + cr.integers(0, 4000, 64)).tolist()
        vecs = cr.standard_normal((64, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        s.upsert_embeddings(ids, [1] * 64, vecs)
        s.remove_items((churn_base + cr.integers(0, 4000, 32)).tolist())

    qr = np.random.default_rng(2)

    def search():
        q = anchors[qr.integers(0, n_anchor)]
        hits = s.search_vector(q, 5)
        assert 1 <= len(hits) <= 5
        for iid, score in hits:
            assert isinstance(iid, int) and np.isfinite(score)

    def snapshot():
        s.matrix.save_snapshot(str(tmp_path / "storm.npz"))
        _t.sleep(0.2)

    tier = {"flip": 0}

    def retier():
        tier["flip"] += 1
        s.matrix.retier(INT2 if tier["flip"] % 2 else jnp.int8)
        s.audit_coarse()
        _t.sleep(0.3)

    threads = [
        threading.Thread(target=guard(fn))
        for fn in (churn, search, search, snapshot, retier)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]

    # quiesce and verify exactness: anchors were never removed, so every
    # anchor must be its own top-1 with its exact self-score
    for i in (0, 137, n_anchor - 1):
        hits = s.search_vector(anchors[i], 1)
        assert hits[0][0] == i + 1
        np.testing.assert_allclose(
            hits[0][1], float(anchors[i] @ anchors[i]), rtol=1e-5
        )
