"""Format-v2 snapshot adoption: quantized payload round trips, layout
preservation, fallbacks (matrix.adopt_snapshot — the fast startup path that
skips per-row upsert bookkeeping and whole-corpus re-quantization)."""

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.db import add_source
from perceive_tpu.index.matrix import (
    INT2,
    INT4,
    EmbeddingMatrix,
    chunk_key,
)
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.types import Source, SourceStatus

TIERS = [jnp.bfloat16, jnp.int8, INT4, INT2]
DIM = 16  # padded to 128


def _filled_matrix(dtype, *, n=50, dim=DIM, seed=0):
    rng = np.random.default_rng(seed)
    m = EmbeddingMatrix(dim, dtype=dtype)
    keys, srcs = [], []
    for i in range(n):
        # every 5th item is chunk-embedded (2 extra chunk rows)
        ks = [chunk_key(i + 1)] + (
            [chunk_key(i + 1, 1), chunk_key(i + 1, 2)] if i % 5 == 0 else []
        )
        keys += ks
        srcs += [1 + i % 3] * len(ks)
    m.upsert(keys, srcs, rng.standard_normal((len(keys), dim)).astype(np.float32))
    # tombstone a few (single-chunk and one chunked group member)
    m.remove([chunk_key(2), chunk_key(3), chunk_key(6, 1)])
    m.sync()
    return m, rng


@pytest.mark.parametrize("dtype", TIERS, ids=["bf16", "int8", "int4", "int2"])
def test_adopt_roundtrip_layout_and_payload(dtype, tmp_path):
    m1, _ = _filled_matrix(dtype)
    snap = str(tmp_path / "snap.npz")
    assert m1.save_snapshot(snap) == "full"

    m2 = EmbeddingMatrix(DIM, dtype=dtype)
    assert m2.adopt_snapshot(snap)

    # row layout preserved verbatim (v1 load renumbers; adopt must not)
    assert m2.rows == m1.rows
    assert m2.row_of == m1.row_of
    assert m2.groups == m1.groups
    assert m2.multi_chunk_groups == m1.multi_chunk_groups
    assert sorted(m2._free) == sorted(m1._free)
    assert np.array_equal(m2.item_ids[: m2.rows], m1.item_ids[: m1.rows])
    assert np.array_equal(m2.source_ids[: m2.rows], m1.source_ids[: m1.rows])
    assert m2.scale_hw == pytest.approx(m1.scale_hw)
    assert m2.norm_hw == pytest.approx(m1.norm_hw)

    # mirror prefix identical
    assert np.array_equal(
        m2._host_vectors[: m2.rows], m1._host_vectors[: m1.rows]
    )

    # device payload identical over the row prefix (same quantizers over the
    # same mirror bytes — adoption must not re-derive anything differently)
    n = m1.rows
    v1, s1, sc1 = m1.device_view()
    v2, s2, sc2 = m2.device_view()
    if dtype is INT2:
        for a, b in zip(v1, v2):  # (coarse, fine), both transposed
            assert np.array_equal(np.asarray(a)[:, :n], np.asarray(b)[:, :n])
        for a, b in zip(sc1, sc2):
            assert np.allclose(np.asarray(a)[:n], np.asarray(b)[:n])
    else:
        a1, a2 = np.asarray(v1), np.asarray(v2)
        if dtype is INT4:  # transposed
            assert np.array_equal(a1[:, :n], a2[:, :n])
        else:
            assert np.array_equal(
                a1[:n].astype(np.float32), a2[:n].astype(np.float32)
            )
        if sc1 is not None:
            assert np.allclose(np.asarray(sc1)[:n], np.asarray(sc2)[:n])
    assert np.array_equal(np.asarray(s1)[:n], np.asarray(s2)[:n])


@pytest.mark.parametrize("dtype", TIERS, ids=["bf16", "int8", "int4", "int2"])
def test_adopt_then_mutate(dtype, tmp_path):
    """The adopted matrix keeps working: tombstone reuse, removes, deltas."""
    m1, rng = _filled_matrix(dtype)
    snap = str(tmp_path / "snap.npz")
    m1.save_snapshot(snap)

    m2 = EmbeddingMatrix(DIM, dtype=dtype)
    assert m2.adopt_snapshot(snap)
    free_before = len(m2._free)
    gen = m2.reuse_gen
    m2.upsert([chunk_key(999)], [1], rng.standard_normal((1, DIM)).astype(np.float32))
    assert len(m2._free) == free_before - 1  # tombstone row reused
    assert m2.reuse_gen == gen + 1
    assert m2.remove([chunk_key(999)]) == 1
    # delta save on top of the adopted base applies cleanly
    assert m2.save_snapshot(snap) == "delta"
    m3 = EmbeddingMatrix.load_snapshot(snap, dtype=dtype)
    assert chunk_key(999) not in m3.row_of
    assert m3.row_of == m2.row_of


def test_adopt_rejects_v1_and_mismatches(tmp_path):
    m1, _ = _filled_matrix(jnp.int8)
    v1 = str(tmp_path / "v1.npz")
    m1.save_snapshot(v1, payload=False)
    # payload-less base still carries v2 metadata but no q_ members
    assert not EmbeddingMatrix(DIM, dtype=jnp.int8).adopt_snapshot(v1)
    # ... and the v1 streaming path still loads it
    m2 = EmbeddingMatrix.load_snapshot(v1, dtype=jnp.int8)
    assert set(m2.row_of) == set(m1.row_of)

    full = str(tmp_path / "v2.npz")
    m1.save_snapshot(full)
    # tier mismatch -> no adoption (falls back to re-quantizing load)
    assert not EmbeddingMatrix(DIM, dtype=jnp.bfloat16).adopt_snapshot(full)
    assert not EmbeddingMatrix(DIM, dtype=INT4).adopt_snapshot(full)
    # dim mismatch
    assert not EmbeddingMatrix(24, dtype=jnp.int8).adopt_snapshot(full)
    # non-empty matrix refuses
    m3 = EmbeddingMatrix(DIM, dtype=jnp.int8)
    m3.upsert([chunk_key(1)], [1], np.ones((1, DIM), np.float32))
    assert not m3.adopt_snapshot(full)


def test_adopt_search_equivalence(tmp_path):
    """Adopted device state ranks identically to a from-scratch build."""
    m1, rng = _filled_matrix(jnp.int8, n=80, seed=3)
    snap = str(tmp_path / "s.npz")
    m1.save_snapshot(snap)
    m2 = EmbeddingMatrix(DIM, dtype=jnp.int8)
    assert m2.adopt_snapshot(snap)

    from perceive_tpu.index.searcher import Searcher as S

    s1 = S(0, 0, DIM, dtype=jnp.int8, engine="xla", matrix=m1)
    s2 = S(0, 0, DIM, dtype=jnp.int8, engine="xla", matrix=m2)
    for _ in range(5):
        q = rng.standard_normal(DIM).astype(np.float32)
        h1 = s1.search_vector(q, 10)
        h2 = s2.search_vector(q, 10)
        assert [i for i, _ in h1] == [i for i, _ in h2]
        assert np.allclose([sc for _, sc in h1], [sc for _, sc in h2])


def test_searcher_build_adopts_quantized_snapshot(tmp_db, tmp_path):
    """Full Searcher.build round trip on a quantized tier: snapshot reload
    + seq replay + tombstone reconcile, all through the adopt fast path."""
    from perceive_tpu.index.matrix import serialize_embedding

    db = tmp_db
    src = add_source(db, Source(name="s", config={"type": "fs"}, location="/x",
                                status=SourceStatus.ready(0, 0)))
    rng = np.random.default_rng(7)

    def insert(ext):
        with db.write() as conn:
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, ext, "", f"content {ext}"),
            )
            iid = cur.lastrowid
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version, embedding,
                     model_id, model_version, seq)
                   VALUES (?,?,?,?,?, (SELECT COALESCE(MAX(seq),0)+1 FROM item_embeddings))""",
                (iid, 1, serialize_embedding(rng.standard_normal(DIM).astype(np.float32)),
                 0, 0),
            )
        return iid

    ids = [insert(f"doc{i}") for i in range(30)]
    s1 = Searcher.build(db, 0, 0, DIM, dtype=jnp.int8, engine="xla")
    snap = str(tmp_path / "snap.npz")
    s1.save_snapshot(db, snap)

    new_id = insert("new-doc")
    db.set_item_hidden(ids[0], True)
    with db.write() as conn:
        conn.execute("DELETE FROM items WHERE id = ?", (ids[1],))

    # the build must go through the adopt FAST path (a silent regression to
    # the streaming fallback would keep every assertion below green while
    # degrading startup to the re-quantizing load)
    adopted = []
    orig = EmbeddingMatrix._adopt_snapshot_fh

    def spy(self, path, fh):
        r = orig(self, path, fh)
        adopted.append(r)
        return r

    monkeypatch = pytest.MonkeyPatch()
    monkeypatch.setattr(EmbeddingMatrix, "_adopt_snapshot_fh", spy)
    try:
        s2 = Searcher.build(db, 0, 0, DIM, dtype=jnp.int8, engine="xla")
    finally:
        monkeypatch.undo()
    assert adopted == [True]
    assert chunk_key(new_id) in s2.matrix.row_of
    assert chunk_key(ids[0]) not in s2.matrix.row_of
    assert chunk_key(ids[1]) not in s2.matrix.row_of

    ref = Searcher.build(db, 0, 0, DIM, dtype=jnp.int8, engine="xla",
                         use_snapshot=False)
    q = rng.standard_normal(DIM).astype(np.float32)
    got = [(i, round(sc, 5)) for i, sc in s2.search_vector(q, 10)]
    want = [(i, round(sc, 5)) for i, sc in ref.search_vector(q, 10)]
    assert got == want


def test_sharded_adopt_int2(tmp_path):
    """adopt_snapshot under a mesh placement (NamedSharding device_put)."""
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    rng = np.random.default_rng(11)
    mesh = make_mesh(4)
    ss = ShardedSearcher(0, 0, DIM, mesh, dtype=INT2, engine="xla")
    keys = [chunk_key(i + 1) for i in range(64)]
    ss.matrix.upsert(keys, [1] * 64, rng.standard_normal((64, DIM)).astype(np.float32))
    ss.matrix.sync()
    snap = str(tmp_path / "s.npz")
    ss.matrix.save_snapshot(snap)

    ss2 = ShardedSearcher(0, 0, DIM, make_mesh(4), dtype=INT2, engine="xla")
    assert ss2.matrix.adopt_snapshot(snap)
    assert ss2.matrix.row_of == ss.matrix.row_of
    q = rng.standard_normal(DIM).astype(np.float32)
    h1 = ss.search_vector(q, 8)
    h2 = ss2.search_vector(q, 8)
    assert [i for i, _ in h1] == [i for i, _ in h2]


def _strip_fmt(path: str) -> None:
    """Rewrite a base zip without its fmt member (simulates a base written
    by the pre-v2 code)."""
    import os
    import zipfile

    tmp = path + ".strip"
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(
        tmp, "w", zipfile.ZIP_STORED, allowZip64=True
    ) as zout:
        for info in zin.infolist():
            if info.filename != "fmt.npy":
                zout.writestr(info, zin.read(info.filename))
    os.replace(tmp, path)


def test_resave_upgrades_v1_base(tmp_path):
    """A pre-v2 base with live delta tracking: save_snapshot must skip the
    delta shortcut and rewrite a full v2 base, or the doctor's "run
    `snapshot` once to upgrade" advice is a no-op forever (review r3)."""
    m, rng = _filled_matrix(jnp.int8)
    snap = str(tmp_path / "snap.npz")
    assert m.save_snapshot(snap) == "full"
    _strip_fmt(snap)
    assert EmbeddingMatrix._snapshot_fmt(snap) == 0
    # small mutation -> delta tracking is alive; against a v2 base this
    # save would take the delta path
    m.upsert([chunk_key(777)], [1], rng.standard_normal((1, DIM)).astype(np.float32))
    assert m.save_snapshot(snap) == "full"
    assert EmbeddingMatrix._snapshot_fmt(snap) == 2
    m2 = EmbeddingMatrix(DIM, dtype=jnp.int8)
    assert m2.adopt_snapshot(snap)
    assert m2.row_of == m.row_of
    # the upgrade is one-time: the next small save deltas again
    m.upsert([chunk_key(778)], [1], rng.standard_normal((1, DIM)).astype(np.float32))
    assert m.save_snapshot(snap) == "delta"


def test_retier_forces_full_base_rewrite(tmp_path):
    """After a mid-session retier the existing base's tier member is stale:
    deltas would extend a base adopt_snapshot rejects forever, so the next
    save must be a full rewrite in the new tier (review r3)."""
    m, rng = _filled_matrix(jnp.int8)
    snap = str(tmp_path / "snap.npz")
    assert m.save_snapshot(snap) == "full"
    gen = m.reuse_gen
    m.retier(INT4)
    # a tier switch invalidates in-flight captures exactly like row reuse
    assert m.reuse_gen == gen + 1
    m.upsert([chunk_key(900)], [1], rng.standard_normal((1, DIM)).astype(np.float32))
    assert m.save_snapshot(snap) == "full"  # not "delta": base tier is stale
    m2 = EmbeddingMatrix(DIM, dtype=INT4)
    assert m2.adopt_snapshot(snap)
    assert m2.row_of == m.row_of
    # upgrade is one-time: the next small save deltas again
    m.upsert([chunk_key(901)], [1], rng.standard_normal((1, DIM)).astype(np.float32))
    assert m.save_snapshot(snap) == "delta"


def test_adopt_mirror_copy_parallel_chunks(tmp_path, monkeypatch):
    """The adopt mirror pass (matrix._mirror_copy_from) copies through a
    worker pool over small chunks (round 5: the single-threaded loop was
    page-fault bound — BENCH_NOTES round-4 adopt section).  Forcing tiny
    chunks + several workers must produce byte-identical mirror contents,
    including the zeroed pad tail, for an odd (non-chunk-aligned) row
    count."""
    from perceive_tpu.index import matrix as mx

    monkeypatch.setattr(mx, "_MIRROR_COPY_CHUNK_BYTES", 256)  # many chunks
    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_THREADS", "3")
    m1, _ = _filled_matrix(jnp.int8, n=67)
    snap = str(tmp_path / "snap.npz")
    m1.save_snapshot(snap)
    m2 = EmbeddingMatrix(DIM, dtype=jnp.int8)
    assert m2.adopt_snapshot(snap)
    n = m1.rows
    np.testing.assert_array_equal(
        np.asarray(m2._host_vectors[:n]), np.asarray(m1._host_vectors[:n])
    )
    # pad tail beyond dim stays zero (mirror.write zeroes it per chunk)
    assert not np.asarray(m2._host_vectors[:n, DIM:]).any()


def test_adopt_mirror_copy_propagates_worker_error(monkeypatch, tmp_path):
    """A worker exception mid-copy must surface from adopt, not vanish."""
    from perceive_tpu.index import matrix as mx

    monkeypatch.setattr(mx, "_MIRROR_COPY_CHUNK_BYTES", 256)
    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_THREADS", "2")
    m1, _ = _filled_matrix(jnp.int8, n=40)
    snap = str(tmp_path / "snap.npz")
    m1.save_snapshot(snap)
    m2 = EmbeddingMatrix(DIM, dtype=jnp.int8)

    calls = []
    orig = m2._mirror.write

    def boom(rows, vals, dim):
        calls.append(rows)
        if len(calls) == 3:
            raise RuntimeError("disk gone")
        return orig(rows, vals, dim)

    monkeypatch.setattr(m2._mirror, "write", boom)
    with pytest.raises(RuntimeError, match="disk gone"):
        m2.adopt_snapshot(snap)
