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


def test_snapshot_delta_roundtrip(tmp_path):
    """After a full base, an autosave with few changed rows writes a small
    .delta (no corpus rewrite); loading base+delta restores everything
    (VERDICT r2 #4 incremental snapshots)."""
    import os

    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(1)
    m = EmbeddingMatrix(16, dtype=np.float32)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    m.upsert(list(range(1, 51)), [0] * 50, vecs)
    snap = str(tmp_path / "base.npz")
    assert m.save_snapshot(snap) == "full"
    base_size = os.path.getsize(snap)

    # small change -> delta, base untouched
    newvec = rng.standard_normal((2, 16)).astype(np.float32)
    m.upsert([3, 51], [0, 0], newvec)
    m.remove([7])
    assert m.save_snapshot(snap) == "delta"
    assert os.path.getsize(snap) == base_size
    assert os.path.getsize(snap + ".delta") < base_size

    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    # deltas convey removals too (removed_keys): 50 base - removed 7 + new 51
    assert len(m2) == 50
    assert 7 not in m2.row_of and 51 in m2.row_of
    np.testing.assert_allclose(m2.host_vectors_for([m2.row_of[3]]), newvec[:1], rtol=1e-6)

    # a delta is bound to ITS base by token: pair it with a different base
    # and it must be ignored (stale-delta crash-ordering guard)
    import shutil

    other = str(tmp_path / "other.npz")
    m3 = EmbeddingMatrix(16, dtype=np.float32)
    m3.upsert([900], [0], rng.standard_normal((1, 16)).astype(np.float32))
    assert m3.save_snapshot(other) == "full"
    shutil.copy(snap + ".delta", other + ".delta")
    m4 = EmbeddingMatrix.load_snapshot(other, dtype=np.float32)
    assert len(m4) == 1 and 51 not in m4.row_of  # foreign delta ignored

    # churn past the threshold (floor: 256 rows for small matrices) flips
    # back to full and removes the stale delta of the old base
    many = rng.standard_normal((400, 16)).astype(np.float32)
    m.upsert(list(range(100, 500)), [0] * 400, many)
    assert m.save_snapshot(snap) == "full"
    assert not os.path.exists(snap + ".delta")  # stale delta removed


def test_snapshot_searches_not_stalled_by_save(tmp_path, monkeypatch):
    """save_snapshot must not hold the matrix lock across the multi-chunk
    write: searches run concurrently with a (deliberately slowed) save and
    never stall for its duration (VERDICT r2 #4)."""
    import threading
    import time

    import perceive_tpu.index.matrix as matmod
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(2)
    d = 64
    s = Searcher(0, 0, d, dtype=np.float32, engine="xla")
    n = 32_768
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    q = vecs[5]
    s.search_vector(q, 5)  # warm the jit

    # slow the OUT-OF-LOCK half of each chunk cycle so the save takes ~1 s:
    # with the round-2 whole-save lock this stalls every search for the full
    # second; with per-chunk locking searches interleave freely
    monkeypatch.setattr(EmbeddingMatrix, "_SYNC_CHUNK_ROWS", 2048)
    orig = np.ascontiguousarray

    def slow_copy(a, *args, **kw):
        time.sleep(0.05)
        return orig(a, *args, **kw)

    monkeypatch.setattr(matmod.np, "ascontiguousarray", slow_copy)

    worst = [0.0]
    stop = threading.Event()

    def prober():
        while not stop.is_set():
            t0 = time.monotonic()
            s.search_vector(q, 5)
            worst[0] = max(worst[0], time.monotonic() - t0)

    t = threading.Thread(target=prober)
    t.start()
    time.sleep(0.02)
    snap = str(tmp_path / "big.npz")
    t0 = time.monotonic()
    form = s.matrix.save_snapshot(snap, incremental=False)
    save_wall = time.monotonic() - t0
    stop.set()
    t.join()
    assert form == "full"
    assert save_wall > 0.5, "save was not slowed; test premise broken"
    assert worst[0] < save_wall / 2, (
        f"a search stalled {worst[0]:.2f}s during a {save_wall:.2f}s save"
    )
    # and the slowed save still produced a valid snapshot
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert len(m2) == n


def test_snapshot_delta_random_op_sequences(tmp_path):
    """Property-style: random upsert/remove sequences interleaved with
    full/delta saves must always reload (base + delta) to exactly the live
    matrix's key set and vectors — the invariant behind every delta rule
    (cumulative-since-base, removed_keys, token binding, churn flip)."""
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(7)
    d = 12
    snap = str(tmp_path / "prop.npz")
    m = EmbeddingMatrix(d, dtype=np.float32)
    next_key = 1

    def live_state(mat):
        return {
            k: tuple(np.round(mat.host_vectors_for([r])[0], 5))
            for k, r in mat.row_of.items()
        }

    for step in range(60):
        op = rng.integers(0, 10)
        if op < 5:  # upsert a few new keys
            n = int(rng.integers(1, 8))
            keys = list(range(next_key, next_key + n))
            next_key += n
            m.upsert(keys, [0] * n, rng.standard_normal((n, d)).astype(np.float32))
        elif op < 7 and m.row_of:  # overwrite existing
            keys = list(rng.choice(list(m.row_of), size=min(3, len(m.row_of)), replace=False))
            m.upsert(keys, [0] * len(keys), rng.standard_normal((len(keys), d)).astype(np.float32))
        elif op < 9 and m.row_of:  # remove some
            keys = list(rng.choice(list(m.row_of), size=min(2, len(m.row_of)), replace=False))
            m.remove([int(k) for k in keys])
        else:  # snapshot (delta when possible) + reload + compare
            m.save_snapshot(snap)
            m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
            assert live_state(m2) == live_state(m), f"divergence at step {step}"
    m.save_snapshot(snap)
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert live_state(m2) == live_state(m)


def test_truncated_snapshot_falls_back(seeded, tmp_path):
    """A corrupt/truncated snapshot file (disk fault — atomic replace makes
    torn writes impossible, but not bit rot) falls back to a full rebuild."""
    db, src, ids, rng = seeded
    s1 = Searcher.build(db, 0, 0, 16, engine="xla")
    snap = str(tmp_path / "t.npz")
    s1.save_snapshot(db, snap)
    data = open(snap, "rb").read()
    with open(snap, "wb") as f:
        f.write(data[: len(data) // 2])
    s2 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert len(s2.matrix) == 10


def test_snapshot_missing_file_falls_back(seeded, tmp_path):
    db, src, ids, rng = seeded
    s1 = Searcher.build(db, 0, 0, 16, engine="xla")
    s1.save_snapshot(db, str(tmp_path / "gone.npz"))
    import os

    os.unlink(tmp_path / "gone.npz")
    s2 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert len(s2.matrix) == 10


def test_snapshot_streamed_load_chunked(tmp_path, monkeypatch):
    """load_snapshot streams the vectors member in bounded row chunks (the
    40M-scale f32 member must never fully materialize, review r3) — force
    tiny chunks and verify the reload is exact, including a tombstoned row
    spanning a chunk boundary."""
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(9)
    m = EmbeddingMatrix(16, dtype=np.float32)
    vecs = rng.standard_normal((57, 16)).astype(np.float32)
    m.upsert(list(range(1, 58)), [0] * 57, vecs)
    m.remove([8, 33])  # tombstones inside different chunks
    snap = str(tmp_path / "chunked.npz")
    assert m.save_snapshot(snap) == "full"

    monkeypatch.setattr(EmbeddingMatrix, "_LOAD_CHUNK_ROWS", 10)
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert len(m2) == 55
    assert 8 not in m2.row_of and 33 not in m2.row_of
    for key in (1, 9, 57):
        got = m2.host_vectors_for([m2.row_of[key]])[0]
        np.testing.assert_allclose(got, vecs[key - 1], rtol=1e-6)


def test_snapshot_delta_remove_racing_token_read(tmp_path, monkeypatch):
    """A remove() racing between save_snapshot's delta decision and the
    delta write must land in the delta's removed_keys — the sets and row
    contents are captured under ONE lock inside _write_delta (review r3:
    two-acquisition capture resurrected the item on crash-reload)."""
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(11)
    m = EmbeddingMatrix(16, dtype=np.float32)
    m.upsert(list(range(1, 31)), [0] * 30, rng.standard_normal((30, 16)).astype(np.float32))
    snap = str(tmp_path / "race.npz")
    assert m.save_snapshot(snap) == "full"
    m.upsert([31], [0], rng.standard_normal((1, 16)).astype(np.float32))

    orig_info = EmbeddingMatrix._snapshot_base_info
    fired = {"n": 0}

    def racing_info(path):
        info = orig_info(path)
        if fired["n"] == 0 and info[0] is not None:
            fired["n"] += 1
            m.remove([5])  # fires between the decision capture and the write
        return info

    monkeypatch.setattr(EmbeddingMatrix, "_snapshot_base_info", staticmethod(racing_info))
    assert m.save_snapshot(snap) == "delta"
    assert fired["n"] == 1

    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert 5 not in m2.row_of, "racing remove resurrected by the delta"
    assert 31 in m2.row_of
    assert len(m2) == 30

def test_snapshot_delta_overflow_racing_save_demotes_to_full(tmp_path, monkeypatch):
    """Delta tracking overflowing to None between save_snapshot's check and
    the delta write must demote the save to a full base, not crash on
    sorted(None) (review r3)."""
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(13)
    m = EmbeddingMatrix(16, dtype=np.float32)
    m.upsert(list(range(1, 21)), [0] * 20, rng.standard_normal((20, 16)).astype(np.float32))
    snap = str(tmp_path / "ovf.npz")
    assert m.save_snapshot(snap) == "full"
    m.upsert([21], [0], rng.standard_normal((1, 16)).astype(np.float32))

    orig_info = EmbeddingMatrix._snapshot_base_info

    def overflowing_info(path):
        info = orig_info(path)
        m._delta_rows = None  # concurrent churn overflowed tracking
        m._delta_removed = set()
        return info

    monkeypatch.setattr(EmbeddingMatrix, "_snapshot_base_info", staticmethod(overflowing_info))
    assert m.save_snapshot(snap) == "full"  # demoted, no TypeError
    monkeypatch.setattr(EmbeddingMatrix, "_snapshot_base_info", staticmethod(orig_info))
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert len(m2) == 21 and 21 in m2.row_of


def test_snapshot_remove_racing_full_write_survives_into_delta(tmp_path, monkeypatch):
    """A remove() landing during the streamed full write must survive into
    the NEXT delta: the just-captured base still holds the key live, so
    clearing the delta sets after the write would let the raw loader
    resurrect the item (review r3 — sets now swap at capture time)."""
    import perceive_tpu.index.matrix as matmod
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(17)
    m = EmbeddingMatrix(16, dtype=np.float32)
    m.upsert(list(range(1, 31)), [0] * 30, rng.standard_normal((30, 16)).astype(np.float32))

    orig = np.ascontiguousarray
    fired = {"n": 0}

    def racing_copy(a, *args, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            m.remove([5])  # lands mid-stream, after the capture
        return orig(a, *args, **kw)

    monkeypatch.setattr(matmod.np, "ascontiguousarray", racing_copy)
    snap = str(tmp_path / "midrm.npz")
    assert m.save_snapshot(snap) == "full"
    monkeypatch.setattr(matmod.np, "ascontiguousarray", orig)
    assert fired["n"] == 1
    # base (captured pre-remove) holds key 5 live; the delta must carry it
    m.upsert([31], [0], rng.standard_normal((1, 16)).astype(np.float32))
    assert m.save_snapshot(snap) == "delta"
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert 5 not in m2.row_of, "mid-save remove lost: raw load resurrected it"
    assert 31 in m2.row_of and len(m2) == 30


def test_snapshot_failed_attempt_never_published(tmp_path, monkeypatch):
    """An attempt that observes tombstone reuse mid-stream must NOT replace
    the previous good base (review r3: publish used to precede the
    reuse_gen check) and must restore the delta sets it swapped out."""
    import perceive_tpu.index.matrix as matmod
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(19)
    m = EmbeddingMatrix(16, dtype=np.float32)
    m.upsert(list(range(1, 21)), [0] * 20, rng.standard_normal((20, 16)).astype(np.float32))
    snap = str(tmp_path / "pub.npz")
    assert m.save_snapshot(snap) == "full"
    good_token = EmbeddingMatrix._snapshot_token(snap)

    m.upsert([21], [0], rng.standard_normal((1, 16)).astype(np.float32))
    with m._lock:
        pre_delta = set(m._delta_rows)
    assert pre_delta  # the new row is tracked against the good base

    orig = np.ascontiguousarray

    def reuse_copy(a, *args, **kw):
        with m._lock:
            m.reuse_gen += 1  # simulated tombstone reuse mid-stream
        return orig(a, *args, **kw)

    monkeypatch.setattr(matmod.np, "ascontiguousarray", reuse_copy)
    assert m._write_full_snapshot(snap, locked=False, token="bad") is False
    monkeypatch.setattr(matmod.np, "ascontiguousarray", orig)

    assert EmbeddingMatrix._snapshot_token(snap) == good_token, (
        "inconsistent attempt was published over the good base"
    )
    with m._lock:
        assert pre_delta <= m._delta_rows, "delta sets not restored on failure"
    # and the good base + its (still-valid) delta reload exactly
    assert m.save_snapshot(snap) == "delta"
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert len(m2) == 21 and 21 in m2.row_of


def test_clear_forces_full_snapshot_and_bumps_reuse_gen(tmp_path):
    """clear() must (a) drop delta tracking to None so the next save is a
    FULL base — a post-clear rebuild's delta against the old base would
    omit removals recorded only in the discarded state and resurrect them —
    and (b) bump reuse_gen, since every row index is re-exposed for
    reallocation (review r3)."""
    from perceive_tpu.index.matrix import EmbeddingMatrix

    rng = np.random.default_rng(23)
    m = EmbeddingMatrix(16, dtype=np.float32)
    m.upsert(list(range(1, 21)), [0] * 20, rng.standard_normal((20, 16)).astype(np.float32))
    snap = str(tmp_path / "clr.npz")
    assert m.save_snapshot(snap) == "full"
    m.remove([5])  # recorded only in the (about-to-be-discarded) delta sets

    gen = m.reuse_gen
    m.clear()
    assert m.reuse_gen > gen, "clear() re-exposes rows without a reuse bump"

    # rebuild WITHOUT key 5 (the DB no longer has it)
    keys = [k for k in range(1, 21) if k != 5]
    m.upsert(keys, [0] * len(keys), rng.standard_normal((len(keys), 16)).astype(np.float32))
    assert m.save_snapshot(snap) == "full", (
        "post-clear save wrote a delta against the stale base"
    )
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert 5 not in m2.row_of and len(m2) == 19


def test_unhide_after_snapshot_returns_at_startup(seeded, tmp_path):
    """Hide -> snapshot -> unhide -> restart: unhide clears hidden_at
    WITHOUT bumping item_embeddings.seq, so the seq replay alone can't see
    the item — the load reconcile must re-load live keys missing from the
    base, or the item stays lost from search on every snapshot startup
    (review r3 CONFIRMED bug)."""
    db, src, ids, rng = seeded
    db.set_item_hidden(ids[0], True)
    s1 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert chunk_key(ids[0]) not in s1.matrix.row_of
    snap = str(tmp_path / "snap.npz")
    s1.save_snapshot(db, snap)

    db.set_item_hidden(ids[0], False)  # unhide AFTER the base was saved

    s2 = Searcher.build(db, 0, 0, 16, engine="xla")
    assert chunk_key(ids[0]) in s2.matrix.row_of
    # identical key set to a from-scratch build
    s3 = Searcher.build(db, 0, 0, 16, engine="xla", use_snapshot=False)
    assert set(s2.matrix.row_of) == set(s3.matrix.row_of)
