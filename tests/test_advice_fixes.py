"""Regression tests for the round-1 advisor findings (ADVICE.md) and the
int8 over-fetch escalation path (VERDICT r1 #4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.index.matrix import EmbeddingMatrix
from perceive_tpu.index.searcher import Searcher


def test_empty_source_filter_returns_nothing():
    """source_ids=[] means "matches nothing", not "no filter" (the round-1
    coercion returned results from ALL sources and [] crashed _scan_filtered)."""
    s = Searcher(0, 0, 8, dtype=jnp.float32, engine="xla")
    vecs = np.random.default_rng(0).standard_normal((20, 8)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)  # self-match wins
    s.upsert_embeddings(list(range(1, 21)), [1] * 20, vecs)
    assert s.search_vector(vecs[0], 5, source_ids=[]) == []
    assert s.search_vectors_batch(vecs[:3], 5, source_ids=[]) == [[], [], []]
    # non-empty filters still work
    assert s.search_vector(vecs[0], 5, source_ids=[1])[0][0] == 1


def test_unhide_restores_all_chunks(tmp_db):
    """hide --unhide must restore every chunk row of a chunk-embedded doc."""
    from types import SimpleNamespace

    from perceive_tpu.cli.commands import hide
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.types import Source

    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((3, 8)).astype(np.float32)
    with tmp_db.write() as conn:
        cur = conn.execute(
            "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
            (src.id, "doc", "", "c"),
        )
        iid = cur.lastrowid
        for ci in range(3):
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version, embedding,
                     model_id, model_version, chunk_idx, seq)
                   VALUES (?,?,?,0,0,?,?)""",
                (iid, 1, serialize_embedding(vecs[ci]), ci, ci + 1),
            )

    s = Searcher.build(tmp_db, 0, 0, 8, dtype=jnp.float32, engine="xla", use_snapshot=False)
    assert len(s.matrix) == 3
    state = SimpleNamespace(db=tmp_db, searcher=s)

    hide(state, SimpleNamespace(item_id=iid, unhide=False))
    assert len(s.matrix) == 0
    hide(state, SimpleNamespace(item_id=iid, unhide=True))
    assert len(s.matrix) == 3, "unhide must restore every chunk row"


def test_matrix_reuses_tombstoned_rows():
    """Repeated remove+upsert churn must not grow capacity without bound."""
    m = EmbeddingMatrix(8, dtype=jnp.float32, capacity=512)
    rng = np.random.default_rng(2)
    ids = list(range(1, 401))
    m.upsert(ids, [1] * 400, rng.standard_normal((400, 8)).astype(np.float32))
    cap0, rows0 = m.capacity, m.rows
    for round_ in range(5):
        m.remove_source(1)
        assert len(m) == 0
        m.upsert(ids, [1] * 400, rng.standard_normal((400, 8)).astype(np.float32))
        assert len(m) == 400
    assert m.capacity == cap0, "churn grew capacity despite tombstone reuse"
    assert m.rows == rows0
    # the reused rows still score correctly
    v = np.zeros(8, np.float32)
    v[0] = 1.0
    m.upsert([999], [1], v.reshape(1, -1))
    assert m.rows == rows0 or m.rows == rows0 + 1


def test_int8_overfetch_escalation():
    """Rows whose quantized scores OVERestimate their exact scores fill the
    initial candidate buffer; the escalation loop must fetch deeper until the
    true winner (accurately quantized, below the inflated floor) surfaces."""
    d = 8
    n_decoy = 64
    # decoys: dim0 true 0.51*s quantizes to 1*s (2x overestimate); the big
    # dim1 value pins the per-row scale
    s_ = 0.01
    decoys = np.zeros((n_decoy, d), np.float32)
    decoys[:, 0] = 0.51 * s_
    decoys[:, 1] = 127 * s_
    # winner: accurate quantization, exact dim0 score 0.008 > decoy exact
    # 0.0051 but quantized 0.008 < decoy quantized 0.01
    winner = np.zeros((1, d), np.float32)
    winner[0, 0] = 0.008
    vecs = np.concatenate([decoys, winner])
    ids = list(range(1, len(vecs) + 1))

    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    s.upsert_embeddings(ids, [1] * len(ids), vecs)

    q = np.zeros(d, np.float32)
    q[0] = 1.0
    hits = s.search_vector(q, 1)
    assert hits[0][0] == len(vecs), (
        f"escalation failed to surface the true winner: {hits}"
    )


def test_overfetch_buckets_exceed_max_k():
    """k=MAX_K on a quantized matrix must still over-fetch (the round-1
    bucket table silently collapsed the rerank over-fetch at 1024)."""
    from perceive_tpu.index.searcher import MAX_K, _k_bucket

    assert _k_bucket(4 * MAX_K, 10_000_000) == 4 * MAX_K
    assert _k_bucket(8 * MAX_K, 10_000_000) == 8 * MAX_K


def test_load_skips_wrong_dim_blobs(tmp_db, capsys):
    """Rows written by a different-dim encoder under the same
    (model_id, model_version) must be skipped at build, not crash np.stack
    (ADVICE r3: legacy 128-dim random-fallback rows under version 0)."""
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.types import Source

    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(2)
    with tmp_db.write() as conn:
        for i, dim in enumerate([8, 8, 128, 8, 16]):
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, f"doc{i}", "", "c"),
            )
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version,
                     embedding, model_id, model_version, chunk_idx, seq)
                   VALUES (?,?,?,0,0,0,?)""",
                (cur.lastrowid, 1,
                 serialize_embedding(rng.standard_normal(dim).astype(np.float32)),
                 i + 1),
            )
    s = Searcher.build(tmp_db, 0, 0, 8, dtype=jnp.float32, engine="xla",
                       use_snapshot=False)
    assert len(s.matrix) == 3  # the three 8-dim rows; 128/16-dim skipped


def test_quarantine_deletes_legacy_wrong_dim_rows(tmp_db):
    """AppState's one-time migration removes wrong-dim rows from the active
    model's keyspace so the match stage re-embeds those items (ADVICE r3:
    doctor only WARNed; the dim-mismatch rows lived forever)."""
    from types import SimpleNamespace

    from perceive_tpu.cli.state import AppState
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.types import Source

    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(3)
    with tmp_db.write() as conn:
        for i, dim in enumerate([8, 128]):
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, f"doc{i}", "", "c"),
            )
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version,
                     embedding, model_id, model_version, chunk_idx, seq)
                   VALUES (?,?,?,0,0,0,?)""",
                (cur.lastrowid, 1,
                 serialize_embedding(rng.standard_normal(dim).astype(np.float32)),
                 i + 1),
            )
    fake = SimpleNamespace(model_id=0, model_version=0, dim=8)
    state = AppState.__new__(AppState)
    state.db = tmp_db
    state.model = fake
    state._quarantine_legacy_fallback_rows()
    rows = tmp_db.read().execute(
        "SELECT LENGTH(embedding) FROM item_embeddings WHERE model_id=0 AND model_version=0"
    ).fetchall()
    assert [r[0] for r in rows] == [32]  # only the 8-dim row survives


def test_scan_with_nonzero_model_version_registers_fk(tmp_db, tmp_path):
    """A scan with a model whose version has no model_versions row (the
    random-fallback reserved version, or any model upgrade) must register
    it instead of dying on the item_embeddings FK — a fresh no-checkpoint
    install could not scan ANYTHING (found by an end-to-end CLI drive)."""
    from perceive_tpu.cli.state import RANDOM_FALLBACK_VERSION, _random_fallback
    from perceive_tpu.db import add_source
    from perceive_tpu.models import ModelType
    from perceive_tpu.sources.pipeline import scan_source
    from perceive_tpu.types import Source

    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "a.md").write_text("the semantic search and a note")
    src = add_source(
        tmp_db,
        Source(name="docs", config={"type": "fs", "location": str(docs)},
               location=str(docs)),
    )
    model = _random_fallback(ModelType.ALL_MINILM_L6_V2)
    assert model.model_version == RANDOM_FALLBACK_VERSION
    stats, ok = scan_source(tmp_db, model, src)
    assert ok, "scan must succeed with an unregistered model version"
    n = tmp_db.read().execute(
        "SELECT COUNT(*) FROM item_embeddings WHERE model_version=?",
        (RANDOM_FALLBACK_VERSION,),
    ).fetchone()[0]
    assert n >= 1


def test_quarantine_runs_once_per_model_config(tmp_db):
    """ADVICE r4: the wrong-dim quarantine is gated by a one-time config
    marker per (model, version, dim) — no full-table LENGTH() scan on
    every startup, and a wrong-dim row inserted AFTER the pass survives
    until the configuration changes (the marker is the evidence the scan
    already ran)."""
    from types import SimpleNamespace

    from perceive_tpu.cli.state import AppState
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.types import Source

    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(4)

    def insert(dim, seq):
        with tmp_db.write() as conn:
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, f"d{seq}", "", "c"),
            )
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version,
                     embedding, model_id, model_version, chunk_idx, seq)
                   VALUES (?,?,?,0,0,0,?)""",
                (cur.lastrowid, 1,
                 serialize_embedding(rng.standard_normal(dim).astype(np.float32)),
                 seq),
            )

    insert(128, 1)  # wrong dim for the 8-dim model below
    state = AppState.__new__(AppState)
    state.db = tmp_db
    state.model = SimpleNamespace(model_id=0, model_version=0, dim=8)
    state._quarantine_legacy_fallback_rows()
    count = lambda: tmp_db.read().execute(  # noqa: E731
        "SELECT COUNT(*) FROM item_embeddings"
    ).fetchone()[0]
    assert count() == 0  # wrong-dim row quarantined
    assert tmp_db.read().execute(
        "SELECT 1 FROM config WHERE key = 'quarantined:0:0:8'"
    ).fetchone()
    insert(128, 2)  # same wrong dim, AFTER the marker
    state._quarantine_legacy_fallback_rows()
    assert count() == 1  # marker present: the pass does not re-run
    # a dim change mints a new marker, so the pass runs once more there
    state.model = SimpleNamespace(model_id=0, model_version=0, dim=16)
    state._quarantine_legacy_fallback_rows()
    assert count() == 0


def test_audit_flunk_retries_exact_select_before_demoting(monkeypatch):
    """ADVICE r4: when phase 3 flunks under the approx select, the audit
    re-measures with select='exact' before demoting the whole coarse tier
    — an underestimated bin-collision rate should cost the ~0.5 ms exact
    select, not the entire coarse speedup."""
    from perceive_tpu.index.matrix import INT2

    rng = np.random.default_rng(11)
    d = 64
    base = rng.standard_normal((4096, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    if s.matrix.quant_bits != 2:
        pytest.skip("int2 tier unavailable")
    s.upsert_embeddings(list(range(1, len(base) + 1)), [1] * len(base), base)
    s.matrix.coarse_select = "approx"
    s.matrix.coarse_trusted = True

    # force phase 3 to flunk exactly when the approx select is active and
    # pass when the exact select is active — isolating the retry logic
    real = s._device_scan
    def fake(qp, kb, allowed, engine, use_coarse=True, force_coarse=False):
        if force_coarse and s.matrix.coarse_select == "approx":
            v, r, f = real(qp, kb, allowed, engine, use_coarse=use_coarse,
                           force_coarse=force_coarse)
            return np.full_like(v, -np.inf), np.full_like(r, -1), f
        return real(qp, kb, allowed, engine, use_coarse=use_coarse,
                    force_coarse=force_coarse)
    monkeypatch.setattr(s, "_device_scan", fake)
    s.audit_coarse(max_queries=8)
    assert s.matrix.coarse_trusted          # rescued, not demoted
    assert s.matrix.coarse_select == "exact"  # by the exact select
