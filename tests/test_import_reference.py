"""Importing a reference (dimfeld/perceive) SQLite database.

The fixture database uses the reference's ORIGINAL schema shape
(00001_init.sql / 00002_tags.sql: item_embeddings WITHOUT chunk_idx/seq,
f32-LE embedding BLOBs) so the importer's column detection and remapping
are exercised against the real on-disk layout a switching user brings.
"""

import sqlite3

import numpy as np
import pytest

from perceive_tpu.cli import AppState, build_parser, dispatch
from perceive_tpu.db.import_reference import import_reference_db
from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab

DIM = 32


@pytest.fixture(scope="module")
def model():
    words = "alpha beta gamma delta hello world".split()
    vocab = tiny_test_vocab(words)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=DIM, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=32)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=7)
    m.model_id = 0
    return m


def make_reference_db(path, vecs):
    """Reference-layout store: 2 sources, 4 items (one hidden, one skipped),
    embeddings under model_id=0 (AllMiniLmL6V2's code id), 1 tag."""
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE sources (id INTEGER PRIMARY KEY, name TEXT NOT NULL,
          config TEXT, location TEXT NOT NULL, compare_strategy TEXT NOT NULL,
          status TEXT NOT NULL, last_indexed BIGINT NOT NULL DEFAULT 0,
          index_version BIGINT NOT NULL DEFAULT 0, index_interval BIGINT);
        CREATE TABLE items (id INTEGER PRIMARY KEY, source_id INTEGER NOT NULL,
          external_id TEXT NOT NULL, version INTEGER NOT NULL DEFAULT 0,
          hash TEXT NOT NULL, content TEXT NOT NULL, raw_content BLOB,
          process_version INTEGER NOT NULL DEFAULT 0, name TEXT, author TEXT,
          description TEXT, modified BIGINT, last_accessed BIGINT,
          skipped TEXT, hidden_at BIGINT);
        CREATE TABLE item_embeddings (model_id INT NOT NULL,
          model_version INT NOT NULL, item_id BIGINT NOT NULL,
          item_index_version BIGINT NOT NULL, embedding BLOB NOT NULL,
          PRIMARY KEY (model_id, model_version, item_id));
        CREATE TABLE tags (id INTEGER PRIMARY KEY, name TEXT NOT NULL,
          description TEXT, color TEXT NOT NULL);
        CREATE TABLE item_tags (item_id BIGINT NOT NULL, tag_id BIGINT NOT NULL,
          PRIMARY KEY (item_id, tag_id));
        """
    )
    conn.execute(
        "INSERT INTO sources (id, name, config, location, compare_strategy, status)"
        " VALUES (1, 'notes', '{\"type\": \"fs\", \"globs\": [\"*.md\"]}', '/ref/notes',"
        " 'm_time_and_content', '{\"status\": \"ready\", \"scanned\": 4, \"duration\": 1}')"
    )
    conn.execute(
        "INSERT INTO sources (id, name, config, location, compare_strategy, status)"
        " VALUES (9, 'web', '{\"type\": \"chromium_history\", \"skip\": [\"x.com\"]}',"
        " '/ref/profile', 'm_time', '{\"status\": \"ready\", \"scanned\": 0, \"duration\": 0}')"
    )
    rows = [
        (11, 1, "/ref/notes/a.md", "a doc", "doc a", None, None),
        (12, 1, "/ref/notes/b.md", "b doc", "doc b", None, None),
        (13, 9, "https://ex.com/", "a page", "page", None, 123456),  # hidden
        (14, 9, "https://dead.com/", "", None, "FetchError: 404", None),  # skipped
    ]
    for iid, sid, ext, content, name, skipped, hidden in rows:
        conn.execute(
            "INSERT INTO items (id, source_id, external_id, hash, content, name,"
            " skipped, hidden_at) VALUES (?,?,?,?,?,?,?,?)",
            (iid, sid, ext, f"h{iid}", content, name, skipped, hidden),
        )
    for iid, v in vecs.items():
        conn.execute(
            "INSERT INTO item_embeddings (model_id, model_version, item_id,"
            " item_index_version, embedding) VALUES (0, 0, ?, 1, ?)",
            (iid, v.astype("<f4").tobytes()),
        )
    conn.execute("INSERT INTO tags (id, name, color) VALUES (5, 'work', '#fff')")
    conn.execute("INSERT INTO item_tags (item_id, tag_id) VALUES (11, 5)")
    conn.commit()
    conn.close()


def unit(seed):
    v = np.random.default_rng(seed).standard_normal(DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def test_import_reference_db_end_to_end(tmp_path, model, capsys):
    ref = tmp_path / "reference.sqlite3"
    vecs = {11: unit(1), 12: unit(2), 13: unit(3)}
    make_reference_db(ref, vecs)

    st = AppState(str(tmp_path / "mine.sqlite3"), model=model, engine="xla")
    try:
        # pre-existing source with a clashing name exercises de-confliction
        dispatch(st, build_parser().parse_args(
            ["source", "add", "fs", str(tmp_path), "--name", "notes"]
        ))
        dispatch(st, build_parser().parse_args(["import-db", str(ref)]))
        out = capsys.readouterr().out
        assert "2 sources" in out and "4 items" in out and "3 embeddings" in out

        names = {s.name for s in st.sources}
        assert {"notes", "notes-imported", "web"} <= names

        # imported vectors are live in the device matrix without any rescan:
        # searching BY the stored vector of item a must find it first
        hits = st.searcher.search_vector(vecs[11], 3)
        rows = st.searcher.retrieve(st.db, hits)
        assert rows and rows[0].item.external_id == "/ref/notes/a.md"
        assert abs(rows[0].score - 1.0) < 5e-2  # bf16 self-similarity

        # the hidden item's vector must NOT be searchable
        ext = [r.item.external_id for r in st.searcher.retrieve(
            st.db, st.searcher.search_vector(vecs[13], 4))]
        assert "https://ex.com/" not in ext

        # tags came across and were remapped to the new item id
        from perceive_tpu.db import items_with_tag

        tagged = items_with_tag(st.db, "work")
        assert len(tagged) == 1
        row = st.db.read().execute(
            "SELECT external_id FROM items WHERE id = ?", (next(iter(tagged)),)
        ).fetchone()
        assert row[0] == "/ref/notes/a.md"

        # skipped item row transferred (with its skip reason) but no vector
        srow = st.db.read().execute(
            "SELECT skipped FROM items WHERE external_id = 'https://dead.com/'"
        ).fetchone()
        assert srow[0] == "FetchError: 404"
    finally:
        st.close()


def test_import_is_idempotent_per_run(tmp_path, model):
    """Importing the same file twice duplicates nothing fatal: names get
    fresh suffixes and searches still resolve (each run is a distinct copy)."""
    ref = tmp_path / "reference.sqlite3"
    make_reference_db(ref, {11: unit(1)})
    st = AppState(str(tmp_path / "mine.sqlite3"), model=model, engine="xla")
    try:
        assert import_reference_db(st.db, str(ref))["sources"] == 2
        stats = import_reference_db(st.db, str(ref))
        assert stats["sources"] == 2 and stats["items"] == 4
        names = [s[0] for s in st.db.read().execute("SELECT name FROM sources")]
        assert len(names) == len(set(names))
    finally:
        st.close()


def test_import_rejects_non_perceive_db(tmp_path, model):
    bogus = tmp_path / "x.sqlite3"
    sqlite3.connect(bogus).executescript("CREATE TABLE t (x);")
    st = AppState(str(tmp_path / "mine.sqlite3"), model=model, engine="xla")
    try:
        with pytest.raises(ValueError, match="not a perceive database"):
            import_reference_db(st.db, str(bogus))
    finally:
        st.close()


def test_import_perceive_tpu_db_preserves_chunks(tmp_path, model):
    """Importing ANOTHER perceive-tpu database (chunk_idx/seq columns
    present) preserves chunk rows and streams every chunk vector."""
    src_db_path = str(tmp_path / "source.sqlite3")
    st1 = AppState(src_db_path, model=model, engine="xla")
    try:
        docs = tmp_path / "docs_pt"
        docs.mkdir()
        # enough repeated words to split into several 8-token chunks
        (docs / "long.txt").write_text(" ".join(["alpha beta gamma delta"] * 20))
        from perceive_tpu.cli import build_parser, dispatch

        dispatch(st1, build_parser().parse_args(
            ["source", "add", "fs", str(docs), "--name", "d", "--chunk-tokens", "8"]
        ))
        dispatch(st1, build_parser().parse_args(["source", "scan", "d"]))
        n_chunks = st1.db.read().execute(
            "SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
        assert n_chunks > 1  # genuinely chunked
    finally:
        st1.close()

    st2 = AppState(str(tmp_path / "dest.sqlite3"), model=model, engine="xla")
    try:
        stats = import_reference_db(
            st2.db, src_db_path,
            st2.searcher.upsert_embeddings,
            (model.model_id, model.model_version),
            st2.searcher.matrix.dim,
        )
        assert stats["embeddings"] == n_chunks
        assert stats["streamed"] == n_chunks
        # chunk keys landed distinctly in the destination matrix
        assert len(st2.searcher.matrix) == n_chunks
        got = st2.db.read().execute(
            "SELECT COUNT(DISTINCT chunk_idx) FROM item_embeddings").fetchone()[0]
        assert got == n_chunks  # one item, n distinct chunk indices
        hits = st2.searcher.search_vector(model.encode_query("alpha beta"), 3)
        assert hits  # deduped to the single imported item
        assert len(hits) == 1
    finally:
        st2.close()
