"""Device-matrix snapshot fast-startup: save, incremental replay, tombstones."""

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.index.matrix import chunk_key, serialize_embedding
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.types import Source, SourceStatus


def _insert_item(db, source_id, ext, vec, model_id=0, version=0):
    with db.write() as conn:
        cur = conn.execute(
            "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
            (source_id, ext, "", f"content {ext}"),
        )
        iid = cur.lastrowid
        conn.execute(
            """INSERT INTO item_embeddings (item_id, item_index_version, embedding,
                 model_id, model_version, seq)
               VALUES (?,?,?,?,?, (SELECT COALESCE(MAX(seq),0)+1 FROM item_embeddings))""",
            (iid, 1, serialize_embedding(vec), model_id, version),
        )
    return iid


@pytest.fixture()
def seeded(tmp_db):
    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x",
                                    status=SourceStatus.ready(0, 0)))
    rng = np.random.default_rng(0)
    ids = [
        _insert_item(tmp_db, src.id, f"doc{i}", rng.standard_normal(16).astype(np.float32))
        for i in range(10)
    ]
    return tmp_db, src, ids, rng


def test_snapshot_roundtrip_and_incremental(seeded, tmp_path):
    db, src, ids, rng = seeded
    s1 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert len(s1.matrix) == 10
    snap = str(tmp_path / "snap.npz")
    s1.save_snapshot(db, snap)

    # new rows + a hide + a delete after the snapshot
    new_id = _insert_item(db, src.id, "new-doc", rng.standard_normal(16).astype(np.float32))
    db.set_item_hidden(ids[0], True)
    with db.write() as conn:
        conn.execute("DELETE FROM items WHERE id = ?", (ids[1],))

    s2 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert len(s2.matrix) == 9  # 10 - hidden - deleted + new
    assert chunk_key(new_id) in s2.matrix.row_of
    assert chunk_key(ids[0]) not in s2.matrix.row_of
    assert chunk_key(ids[1]) not in s2.matrix.row_of

    # results identical to a from-scratch build
    s3 = Searcher.build(db, 0, 0, 16, engine="xla", use_snapshot=False)
    q = rng.standard_normal(16).astype(np.float32)
    assert s2.search_vector(q, 5) == s3.search_vector(q, 5)


def test_snapshot_changed_embedding_replayed(seeded, tmp_path):
    db, src, ids, rng = seeded
    s1 = Searcher.build(db, 0, 0, 16, engine="xla")
    snap = str(tmp_path / "snap.npz")
    s1.save_snapshot(db, snap)

    # overwrite one embedding (higher seq) — must win over the snapshot row
    newvec = np.full(16, 9.0, np.float32)
    with db.write() as conn:
        conn.execute(
            """UPDATE item_embeddings
               SET embedding = ?, seq = (SELECT MAX(seq)+1 FROM item_embeddings)
               WHERE item_id = ?""",
            (serialize_embedding(newvec), ids[3]),
        )
    s2 = Searcher.build(db, 0, 0, 16, engine="xla")
    hits = s2.search_vector(np.full(16, 1.0, np.float32), 1)
    assert hits[0][0] == ids[3]


def test_snapshot_missing_file_falls_back(seeded, tmp_path):
    db, src, ids, rng = seeded
    s1 = Searcher.build(db, 0, 0, 16, engine="xla")
    s1.save_snapshot(db, str(tmp_path / "gone.npz"))
    import os

    os.unlink(tmp_path / "gone.npz")
    s2 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert len(s2.matrix) == 10
