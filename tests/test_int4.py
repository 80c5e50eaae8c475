"""Int4 packed candidate scan + f32 rerank (VERDICT r1 #2: the sub-byte
prefilter that cuts bytes/query 4x vs bf16 on the bandwidth-bound sweep)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.index.matrix import INT4, EmbeddingMatrix
from perceive_tpu.index.searcher import Searcher


def _unit_rows(rng, n, d):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_quantize4_pack_roundtrip():
    m = EmbeddingMatrix(256, dtype=INT4)
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((64, 256)).astype(np.float32)
    packed, scales = m._quantize4(rows)
    assert packed.shape == (64, 128) and packed.dtype == np.uint8
    lo = (packed & 15).astype(np.int32) - 8  # low nibble biased +8
    hb = (packed >> 4).astype(np.int32)
    hi = np.where(hb >= 8, hb - 16, hb)  # high nibble two's complement
    recon = np.concatenate([lo, hi], axis=1) * scales[:, None]
    err = np.abs(recon - rows)
    assert err.max() <= (scales[:, None] / 2 + 1e-6).max(), "nibble rounding exceeded scale/2"
    # low nibbles biased into [1, 15] (0 never produced)
    assert (packed & 15).min() >= 1
    # the algebraic identity the kernel relies on: int8(byte) = lo_nib + 16*hi
    x8 = packed.astype(np.int8).astype(np.int32)
    np.testing.assert_array_equal(x8, (lo + 8) + 16 * hi)


def test_int4_pallas_matches_xla_engine():
    """The Pallas int4 kernel and the XLA unpack fallback compute identical
    quantized candidate scores."""
    from perceive_tpu.index.searcher import _scan_topk_xla_int4
    from perceive_tpu.ops.topk import ALLOW_ALL, scan_topk_pallas_int4

    rng = np.random.default_rng(1)
    n, d, k = 2048, 256, 16
    m = EmbeddingMatrix(d, dtype=INT4, capacity=n)
    vecs = _unit_rows(rng, n, d)
    m.upsert(list(range(1, n + 1)), [0] * n, vecs)
    packed, src, scales = m.device_view()
    assert packed.shape == (d // 2, n) and packed.dtype == jnp.uint8

    q = jnp.asarray(_unit_rows(rng, 3, d))
    allowed = np.full(16, -9, np.int32)
    allowed[0] = ALLOW_ALL
    pv, pr = scan_topk_pallas_int4(packed, scales, src, q, jnp.asarray(allowed), k)
    xv, xr = _scan_topk_xla_int4(packed, scales, src, q, jnp.asarray(allowed), k)
    np.testing.assert_array_equal(np.asarray(pr), np.asarray(xr))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-6)


def test_int4_slabbed_kernel_matches_flat():
    """The slabbed int4 kernel (batch >= 2 slabs; unpack amortized per row
    tile) returns the same candidates as the flat kernel (VERDICT r2 #5)."""
    from perceive_tpu.index.searcher import _scan_topk_xla_int4
    from perceive_tpu.ops.topk import ALLOW_ALL, scan_topk_pallas_int4

    rng = np.random.default_rng(4)
    n, d, k = 1024, 128, 8
    m = EmbeddingMatrix(d, dtype=INT4, capacity=n)
    vecs = _unit_rows(rng, n, d)
    m.upsert(list(range(1, n + 1)), [0] * n, vecs)
    packed, src, scales = m.device_view()

    q = jnp.asarray(_unit_rows(rng, 256, d))  # 2 slabs -> slabbed route
    allowed = np.full(16, -9, np.int32)
    allowed[0] = ALLOW_ALL
    pv, pr = scan_topk_pallas_int4(packed, scales, src, q, jnp.asarray(allowed), k)
    xv, xr = _scan_topk_xla_int4(packed, scales, src, q, jnp.asarray(allowed), k)
    np.testing.assert_array_equal(np.asarray(pr), np.asarray(xr))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-6)


def test_sharded_quantized_slabbed_batches():
    """Large batches through the SHARDED pallas path route per-shard slabbed
    kernels (int8 and int4) and, with the inherited rerank, match the f32
    oracle searcher exactly (VERDICT r2 #5)."""
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    mesh = make_mesh(4)
    rng = np.random.default_rng(9)
    n, d, nq, k = 2048, 32, 256, 5
    vecs = _unit_rows(rng, n, d)
    s1 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    s1.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    q = vecs[:nq] + 0.05 * rng.standard_normal((nq, d)).astype(np.float32)
    want = s1.search_vectors_batch(q, k)
    for dtype in (jnp.int8, INT4):
        ss = ShardedSearcher(0, 0, d, mesh, dtype=dtype, engine="pallas")
        ss.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
        got = ss.search_vectors_batch(q, k)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_int4_searcher_exact_after_rerank(engine):
    """End to end: int4 candidates + f32 rerank + escalation return the same
    ranking as the f32 exact searcher."""
    rng = np.random.default_rng(2)
    n, d, k = 3000, 64, 10
    vecs = _unit_rows(rng, n, d)
    ids = list(range(1, n + 1))
    srcs = [i % 3 for i in range(n)]

    s4 = Searcher(0, 0, d, dtype=INT4, engine=engine)
    sf = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    s4.upsert_embeddings(ids, srcs, vecs)
    sf.upsert_embeddings(ids, srcs, vecs)

    for qi in range(20):
        qv = vecs[rng.integers(0, n)] if qi % 2 else _unit_rows(rng, 1, d)[0]
        got = s4.search_vector(qv, k)
        want = sf.search_vector(qv, k)
        assert [i for i, _ in got] == [i for i, _ in want], f"query {qi} diverged"
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in want], rtol=1e-5
        )
    # filtered search stays exact too
    got = s4.search_vector(vecs[5], k, source_ids=[2])
    want = sf.search_vector(vecs[5], k, source_ids=[2])
    assert [i for i, _ in got] == [i for i, _ in want]


def test_int4_incremental_updates():
    """Tombstones + incremental upserts flow through the packed column
    scatter (not a full re-upload)."""
    rng = np.random.default_rng(3)
    d = 64
    s = Searcher(0, 0, d, dtype=INT4, engine="xla")
    vecs = _unit_rows(rng, 600, d)
    s.upsert_embeddings(list(range(1, 601)), [0] * 600, vecs)
    assert s.search_vector(vecs[9], 1)[0][0] == 10
    s.matrix.sync()  # settle; next upsert goes down the incremental path
    nv = _unit_rows(rng, 1, d)
    s.upsert_embeddings([10], [0], nv)
    assert s.search_vector(nv[0], 1)[0][0] == 10
    s.remove_items([10])
    assert s.search_vector(nv[0], 1)[0][0] != 10


def test_int4_sharded_matches_single_chip():
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    mesh = make_mesh(4)
    rng = np.random.default_rng(4)
    n, d, k = 2500, 48, 12
    vecs = _unit_rows(rng, n, d)
    ids = list(range(1, n + 1))
    srcs = [i % 3 for i in range(n)]

    ss = ShardedSearcher(0, 0, d, mesh, dtype=INT4, engine="xla")
    s1 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    ss.upsert_embeddings(ids, srcs, vecs)
    s1.upsert_embeddings(ids, srcs, vecs)

    qv = vecs[77]
    got = ss.search_vector(qv, k)
    want = s1.search_vector(qv, k)
    assert [i for i, _ in got] == [i for i, _ in want]
    got = ss.search_vector(qv, k, source_ids=[1])
    want = s1.search_vector(qv, k, source_ids=[1])
    assert [i for i, _ in got] == [i for i, _ in want]


def test_int4_sharded_pallas_interpret():
    """Sharded int4 through the Pallas kernel (interpret on the CPU mesh)."""
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    mesh = make_mesh(4)
    rng = np.random.default_rng(5)
    n, d, k = 2048, 128, 8
    vecs = _unit_rows(rng, n, d)
    ids = list(range(1, n + 1))

    ss = ShardedSearcher(0, 0, d, mesh, dtype=INT4, engine="pallas")
    s1 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    ss.upsert_embeddings(ids, [0] * n, vecs)
    s1.upsert_embeddings(ids, [0] * n, vecs)
    got = ss.search_vector(vecs[123], k)
    want = s1.search_vector(vecs[123], k)
    assert [i for i, _ in got] == [i for i, _ in want]


def test_int4_snapshot_roundtrip(tmp_db, tmp_path):
    """Snapshots store f32 host vectors; an int4 searcher must save/load."""
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.types import Source

    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(6)
    vecs = _unit_rows(rng, 50, 32)
    with tmp_db.write() as conn:
        for i, v in enumerate(vecs):
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, f"d{i}", "", "c"),
            )
            conn.execute(
                """INSERT INTO item_embeddings (item_item_id, item_index_version, embedding,
                     model_id, model_version, seq)
                   VALUES (?,?,?,0,0,?)""".replace("item_item_id", "item_id"),
                (cur.lastrowid, 1, serialize_embedding(v), i + 1),
            )
    s = Searcher.build(tmp_db, 0, 0, 32, dtype=INT4, engine="xla", use_snapshot=False)
    s.save_snapshot(tmp_db, str(tmp_path / "snap.npz"))
    s2 = Searcher.build(tmp_db, 0, 0, 32, dtype=INT4, engine="xla", use_snapshot=True)
    assert len(s2.matrix) == 50
    assert s2.search_vector(vecs[7], 1)[0][0] == s.search_vector(vecs[7], 1)[0][0]


def test_sharded_unaligned_large_batch_pads_to_slab():
    """Unaligned large batches (>= 2*QUERY_SLAB, not a slab multiple) through
    the SHARDED pallas path must zero-pad up to the slab width instead of
    reaching the flat kernels, whose Q-scaled VMEM scratch fails Mosaic
    compilation near Q~2k on hardware (review r3: the shard_map local body
    bypassed the single-chip _slab_pad wrappers).  Results match the f32
    oracle searcher after the inherited rerank."""
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    mesh = make_mesh(4)
    rng = np.random.default_rng(13)
    n, d, nq, k = 2048, 32, 260, 5  # 260 = 2*128 + 4
    vecs = _unit_rows(rng, n, d)
    s1 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    s1.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    q = vecs[:nq] + 0.05 * rng.standard_normal((nq, d)).astype(np.float32)
    want = s1.search_vectors_batch(q, k)
    for dtype in (jnp.int8, INT4):
        ss = ShardedSearcher(0, 0, d, mesh, dtype=dtype, engine="pallas")
        ss.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
        got = ss.search_vectors_batch(q, k)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]


def test_sharded_scan_topk_requires_scales_for_quantized():
    """Passing a quantized matrix without scales must raise, not silently
    score everything as 0 through placeholder scales (review r3)."""
    import pytest as _pytest

    from perceive_tpu.parallel import make_mesh
    from perceive_tpu.parallel.search import sharded_scan_topk
    from perceive_tpu.parallel.mesh import rows_sharding, rows_1d_sharding
    import jax

    mesh = make_mesh(4)
    rng = np.random.default_rng(5)
    m8 = jax.device_put(
        rng.integers(-127, 127, (512, 32)).astype(np.int8), rows_sharding(mesh)
    )
    src = jax.device_put(np.zeros(512, np.int32), rows_1d_sharding(mesh))
    q = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    allowed = jnp.full((16,), -(2**31) + 1, jnp.int32)
    from perceive_tpu.ops.topk import ALLOW_ALL

    allowed = jnp.full((16,), ALLOW_ALL, jnp.int32)
    with _pytest.raises(ValueError, match="scales"):
        sharded_scan_topk(mesh, m8, src, q, allowed, 5)
