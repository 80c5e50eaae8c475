"""Store-layer tests: migrations, item round-trip, hide/unhide, source CRUD,
and concurrent write discipline."""

import threading

from perceive_tpu.db import (
    ITEM_COLUMNS,
    add_source,
    deserialize_item_row,
    get_source,
    list_sources,
    update_source,
)
from perceive_tpu.types import (
    Item,
    ItemCompareStrategy,
    ItemMetadata,
    SkipReason,
    Source,
    SourceStatus,
)


def _insert_item(db, source_id=1, external_id="a.md", content="hello"):
    with db.write() as conn:
        cur = conn.execute(
            """INSERT INTO items (source_id, external_id, version, hash, content,
               name, modified, last_accessed, skipped)
               VALUES (?, ?, 1, 'h', ?, 'A', 100, 200, NULL)""",
            (source_id, external_id, content),
        )
        return cur.lastrowid


def test_migrations_applied(tmp_db):
    (v,) = tmp_db.read().execute("PRAGMA user_version").fetchone()
    assert v >= 4
    names = {
        r[0]
        for r in tmp_db.read()
        .execute("SELECT name FROM sqlite_master WHERE type='table'")
        .fetchall()
    }
    assert {
        "config",
        "models",
        "model_versions",
        "sources",
        "items",
        "item_embeddings",
        "tags",
        "item_tags",
        "vector_shards",
    } <= names
    # model ids must match the registry mapping used to key embeddings
    rows = dict(tmp_db.read().execute("SELECT id, name FROM models").fetchall())
    assert rows[0] == "AllMiniLmL6V2"
    assert rows[7] == "MsMarcoBertBaseDotV5"


def test_item_roundtrip(tmp_db):
    src = add_source(tmp_db, Source(name="notes", location="/tmp/x", config={"type": "fs"}))
    item_id = _insert_item(tmp_db, source_id=src.id)
    item = tmp_db.read_item(item_id)
    assert item is not None
    assert item.external_id == "a.md"
    assert item.content == "hello"
    assert item.metadata.name == "A"
    assert item.metadata.mtime == 100
    assert item.metadata.atime == 200
    assert item.skipped is None


def test_skip_reason_roundtrip(tmp_db):
    src = add_source(tmp_db, Source(name="s", location="x", config={"type": "fs"}))
    with tmp_db.write() as conn:
        cur = conn.execute(
            "INSERT INTO items (source_id, external_id, hash, content, skipped)"
            " VALUES (?, 'u', '', '', 'fetch_error')",
            (src.id,),
        )
        iid = cur.lastrowid
    item = tmp_db.read_item(iid)
    assert item.skipped is SkipReason.FETCH_ERROR
    assert item.skipped.permanent
    assert not SkipReason.NO_CONTENT.permanent


def test_hide_unhide(tmp_db):
    src = add_source(tmp_db, Source(name="s", location="x", config={"type": "fs"}))
    iid = _insert_item(tmp_db, source_id=src.id)
    tmp_db.set_item_hidden(iid, True)
    (hidden_at,) = tmp_db.read().execute(
        "SELECT hidden_at FROM items WHERE id=?", (iid,)
    ).fetchone()
    assert hidden_at is not None
    # the reference's --unhide was a no-op bug; ours must clear the flag
    tmp_db.set_item_hidden(iid, False)
    (hidden_at,) = tmp_db.read().execute(
        "SELECT hidden_at FROM items WHERE id=?", (iid,)
    ).fetchone()
    assert hidden_at is None


def test_source_crud(tmp_db):
    s = Source(
        name="notes",
        location="/home/me/notes",
        config={"type": "fs", "globs": ["**/*.md"]},
        compare_strategy=ItemCompareStrategy.MTIME,
        status=SourceStatus.indexing(started_at=42),
    )
    s = add_source(tmp_db, s)
    assert s.id > 0
    got = get_source(tmp_db, "notes")
    assert got.config["globs"] == ["**/*.md"]
    assert got.compare_strategy is ItemCompareStrategy.MTIME
    assert got.status.status == "indexing" and got.status.started_at == 42

    got.status = SourceStatus.ready(scanned=10, duration=3)
    got.index_version = 2
    update_source(tmp_db, got)
    again = get_source(tmp_db, got.id)
    assert again.status.scanned == 10
    assert again.index_version == 2
    assert [x.name for x in list_sources(tmp_db)] == ["notes"]


def test_concurrent_writes(tmp_db):
    src = add_source(tmp_db, Source(name="s", location="x", config={"type": "fs"}))
    n_threads, per_thread = 8, 25
    barrier = threading.Barrier(n_threads)

    def writer(t):
        barrier.wait()
        for i in range(per_thread):
            with tmp_db.write() as conn:
                conn.execute(
                    "INSERT INTO items (source_id, external_id, hash, content)"
                    " VALUES (?, ?, '', '')",
                    (src.id, f"t{t}-{i}"),
                )

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    (count,) = tmp_db.read().execute("SELECT COUNT(*) FROM items").fetchone()
    assert count == n_threads * per_thread


def test_deserialize_item_row_matches_columns(tmp_db):
    src = add_source(tmp_db, Source(name="s", location="x", config={"type": "fs"}))
    iid = _insert_item(tmp_db, source_id=src.id)
    row = tmp_db.read().execute(
        f"SELECT {ITEM_COLUMNS} FROM items WHERE id=?", (iid,)
    ).fetchone()
    item = deserialize_item_row(row)
    assert isinstance(item, Item)
    assert isinstance(item.metadata, ItemMetadata)
    assert item.id == iid


def test_migration_upgrade_preserves_embeddings(tmp_path):
    """A database created at schema 5 (pre-chunk) upgrades in place: existing
    embedding rows land at chunk_idx 0 with seq preserved."""
    import sqlite3

    from perceive_tpu.db import Database
    from perceive_tpu.db.migrations import MIGRATIONS

    path = tmp_path / "old.sqlite3"
    conn = sqlite3.connect(path)
    for i, sql in enumerate(MIGRATIONS[:5], start=1):
        conn.executescript(sql)
        conn.execute(f"PRAGMA user_version = {i}")
    conn.execute(
        "INSERT INTO sources (name, location, compare_strategy, status) VALUES ('s','/x','m_time','{}')"
    )
    conn.execute(
        "INSERT INTO items (source_id, external_id, hash, content) VALUES (1,'doc','', 'c')"
    )
    conn.execute(
        """INSERT INTO item_embeddings
             (item_id, item_index_version, embedding, model_id, model_version, seq)
           VALUES (1, 1, x'00000000', 0, 0, 7)"""
    )
    conn.commit()
    conn.close()

    db = Database(path)
    row = db.read().execute(
        "SELECT item_id, chunk_idx, seq FROM item_embeddings"
    ).fetchone()
    assert row == (1, 0, 7)
    assert db.read().execute("PRAGMA user_version").fetchone()[0] == len(MIGRATIONS)
    db.close()


def test_migration_7_merges_duplicate_tags(tmp_path):
    """A pre-migration-7 database holding duplicate tag names (the race the
    migration exists to prevent) must still open: duplicates merge into the
    lowest-id tag, item_tags repoint (colliding pairs collapse), and the
    unique index builds over the deduped table."""
    import sqlite3

    from perceive_tpu.db import Database
    from perceive_tpu.db.migrations import MIGRATIONS

    path = tmp_path / "dupes.sqlite3"
    conn = sqlite3.connect(path)
    for i, sql in enumerate(MIGRATIONS[:6], start=1):
        conn.executescript(sql)
        conn.execute(f"PRAGMA user_version = {i}")
    conn.execute(
        "INSERT INTO sources (name, location, compare_strategy, status) VALUES ('s','/x','m_time','{}')"
    )
    for ext in ("a", "b"):
        conn.execute(
            "INSERT INTO items (source_id, external_id, hash, content) VALUES (1,?,'','c')",
            (ext,),
        )
    # Duplicate 'work' tags (ids 1 and 2) plus a clean 'home' tag (id 3).
    conn.execute("INSERT INTO tags (id, name, color) VALUES (1, 'work', 'red')")
    conn.execute("INSERT INTO tags (id, name, color) VALUES (2, 'work', 'blue')")
    conn.execute("INSERT INTO tags (id, name, color) VALUES (3, 'home', 'green')")
    # Item 1 tagged via BOTH duplicate rows (repoint must collapse, not
    # violate the item_tags PK); item 2 tagged only via the doomed row.
    conn.execute("INSERT INTO item_tags (item_id, tag_id) VALUES (1, 1)")
    conn.execute("INSERT INTO item_tags (item_id, tag_id) VALUES (1, 2)")
    conn.execute("INSERT INTO item_tags (item_id, tag_id) VALUES (2, 2)")
    conn.commit()
    conn.close()

    db = Database(path)  # would raise before the dedupe fix
    names = [r[0] for r in db.read().execute("SELECT name FROM tags ORDER BY name")]
    assert names == ["home", "work"]
    pairs = sorted(
        db.read().execute("SELECT item_id, tag_id FROM item_tags").fetchall()
    )
    assert pairs == [(1, 1), (2, 1)]
    # The unique index now rejects a second 'work'.
    import pytest

    with pytest.raises(sqlite3.IntegrityError):
        with db.write() as w:
            w.execute("INSERT INTO tags (name, color) VALUES ('work', 'x')")
    db.close()
