"""Regression tests for the code-review hardening round."""

import os
import time

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab
from perceive_tpu.sources import prune_missing_items, scan_source
from perceive_tpu.sources.fs import FileScanner
from perceive_tpu.types import Source


@pytest.fixture(scope="module")
def model():
    vocab = tiny_test_vocab("alpha beta gamma hello world".split())
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=16)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=16)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=11)
    m.model_id = 0
    return m


def test_read_error_does_not_feed_prune(tmp_db, tmp_path, model):
    """A transient per-item read failure must not let prune delete the item."""
    root = tmp_path / "docs"
    root.mkdir()
    f = root / "x.txt"
    f.write_text("hello world")
    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location=str(root)))
    scan_source(tmp_db, model, src, embed_batch_size=4)

    class FlakyScanner(FileScanner):
        def read(self, existing, compare_strategy, item):
            raise OSError("transient I/O blip")

    # force mtime change so the read stage actually attempts the read
    os.utime(f, (time.time() + 9, time.time() + 9))
    src.index_version += 1
    stats, ok = scan_source(
        tmp_db, model, src,
        scanner=FlakyScanner(src.id, str(root), src.config), embed_batch_size=4,
    )
    assert ok
    removed = prune_missing_items(tmp_db, src)
    assert removed == []  # version was bumped despite the read error
    assert tmp_db.read().execute("SELECT COUNT(*) FROM items").fetchone()[0] == 1


def test_emptied_document_evicts_embeddings(tmp_db, tmp_path, model):
    """Rewriting a doc to whitespace clears its vectors from DB and device."""
    root = tmp_path / "docs2"
    root.mkdir()
    f = root / "x.txt"
    f.write_text("hello world alpha")
    src = add_source(tmp_db, Source(name="s2", config={"type": "fs"}, location=str(root)))
    searcher = Searcher(0, 0, model.dim, engine="xla")
    scan_source(
        tmp_db, model, src,
        on_embeddings=searcher.upsert_embeddings, on_removed=searcher.remove_items,
        embed_batch_size=4,
    )
    assert len(searcher.matrix) == 1

    # whitespace-only is Omitted by the fs scanner; use a name-only doc so
    # content is stored empty: front matter with no body
    f.write_text("---\nother: 1\n---\n   \n")
    os.utime(f, (time.time() + 9, time.time() + 9))
    scan_source(
        tmp_db, model, src,
        on_embeddings=searcher.upsert_embeddings, on_removed=searcher.remove_items,
        embed_batch_size=4,
    )
    n_emb = tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
    assert n_emb == 0
    assert len(searcher.matrix) == 0


def test_source_filter_beyond_16_not_truncated():
    rng = np.random.default_rng(0)
    n, d = 2000, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    sources = [i % 25 for i in range(n)]  # 25 distinct sources
    s = Searcher(0, 0, d, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), sources, vecs)

    q = rng.standard_normal(d).astype(np.float32)
    wanted = list(range(20))  # > MAX_SOURCE_FILTER
    hits = s.search_vector(q, 10, source_ids=wanted)
    assert len(hits) == 10
    # oracle over exactly those sources
    mask = np.isin(np.array(sources), wanted)
    scores = vecs @ q
    scores[~mask] = -np.inf
    want_ids = (np.argsort(-scores)[:10] + 1).tolist()
    assert [i for i, _ in hits] == want_ids


def test_k_too_large_raises():
    s = Searcher(0, 0, 16, engine="xla")
    s.upsert_embeddings([1], [0], np.ones((1, 16), np.float32))
    with pytest.raises(ValueError, match="exceeds"):
        s.search_vector(np.ones(16, np.float32), 2000)


def test_multi_chunk_counter():
    from perceive_tpu.index import EmbeddingMatrix

    m = EmbeddingMatrix(16, capacity=512)
    s = Searcher(0, 0, 16, engine="xla")
    s.matrix = m
    s.upsert_embeddings([(1, 0), (2, 0)], [0, 0], np.ones((2, 16), np.float32))
    assert m.multi_chunk_groups == 0
    # an upsert carries an item's complete chunk set
    s.upsert_embeddings([(1, 0), (1, 1)], [0, 0], np.ones((2, 16), np.float32))
    assert m.multi_chunk_groups == 1
    # shrinking back to one chunk evicts the stale key and the counter drops
    s.upsert_embeddings([(1, 0)], [0], np.ones((1, 16), np.float32))
    assert m.multi_chunk_groups == 0
    s.upsert_embeddings([(1, 0), (1, 1), (1, 2)], [0] * 3, np.ones((3, 16), np.float32))
    assert m.multi_chunk_groups == 1
    s.remove_items([1])
    assert m.multi_chunk_groups == 0


def test_slash_globs_match_absolute_locations(tmp_db, tmp_path, model):
    """Globs with '/' (incl. '**/*.md') are matched against ROOT-RELATIVE
    paths — matching against absolute paths made them match nothing."""
    root = tmp_path / "docs9"
    (root / "sub").mkdir(parents=True)
    (root / "top.md").write_text("alpha beta")
    (root / "sub" / "deep.md").write_text("gamma hello")
    (root / "sub" / "skip.txt").write_text("world")
    src = add_source(
        tmp_db,
        Source(name="g", config={"type": "fs", "globs": ["**/*.md"]}, location=str(root)),
    )
    stats, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok
    names = {
        os.path.basename(r[0])
        for r in tmp_db.read().execute("SELECT external_id FROM items")
    }
    assert names == {"top.md", "deep.md"}


def test_migration_failure_is_atomic(tmp_path):
    """A migration that fails mid-script leaves the DB at the prior version
    with no partial changes (crash-safe migrations)."""
    import sqlite3 as s3

    from perceive_tpu.db import migrations

    path = tmp_path / "m.sqlite3"
    conn = s3.connect(path, isolation_level=None)
    broken = migrations.MIGRATIONS + [
        "CREATE TABLE half_done (x INT);\nCREATE TABLE items (dupe INT);"  # 2nd stmt fails
    ]
    orig = migrations.MIGRATIONS
    migrations.MIGRATIONS = broken
    try:
        import pytest as _pytest

        with _pytest.raises(s3.OperationalError):
            migrations.migrate(conn)
    finally:
        migrations.MIGRATIONS = orig
    assert conn.execute("PRAGMA user_version").fetchone()[0] == len(orig)
    tables = {r[0] for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")}
    assert "half_done" not in tables  # first statement rolled back
    conn.close()
