"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: mesh/pjit/collective tests via host platform device count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.parallel import (
    ShardedSearcher,
    batch_sharding,
    make_mesh,
    shard_params,
    sharded_scan_topk,
)
from perceive_tpu.parallel.mesh import rows_1d_sharding, rows_sharding


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_scan_matches_oracle():
    mesh = make_mesh(8)
    n, d, nq, k = 4096, 64, 3, 16
    rng = np.random.default_rng(0)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    source_ids = rng.integers(0, 4, n).astype(np.int32)
    source_ids[::17] = -1
    q = rng.standard_normal((nq, d)).astype(np.float32)
    allowed = np.full(16, -9, np.int32)
    allowed[0] = -2  # ALLOW_ALL

    dm = jax.device_put(jnp.asarray(matrix), rows_sharding(mesh))
    ds = jax.device_put(jnp.asarray(source_ids), rows_1d_sharding(mesh))
    vals, rows = sharded_scan_topk(mesh, dm, ds, jnp.asarray(q), jnp.asarray(allowed), k)

    scores = np.where(source_ids[None, :] >= 0, q @ matrix.T, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(scores, idx, 1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), idx)


def test_sharded_scan_source_filter():
    mesh = make_mesh(4)
    n, d, k = 2048, 32, 8
    rng = np.random.default_rng(1)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    source_ids = (np.arange(n) % 5).astype(np.int32)
    q = rng.standard_normal((1, d)).astype(np.float32)
    allowed = np.full(16, -9, np.int32)
    allowed[:2] = [2, 4]

    dm = jax.device_put(jnp.asarray(matrix), rows_sharding(mesh))
    ds = jax.device_put(jnp.asarray(source_ids), rows_1d_sharding(mesh))
    vals, rows = sharded_scan_topk(mesh, dm, ds, jnp.asarray(q), jnp.asarray(allowed), k)
    rows = np.asarray(rows)[np.asarray(vals) > -np.inf]
    assert len(rows) == k
    assert np.isin(source_ids[rows], [2, 4]).all()


def test_sharded_searcher_end_to_end():
    from perceive_tpu.index.searcher import Searcher

    mesh = make_mesh(8)
    n, d = 3000, 48
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = list(range(1, n + 1))
    srcs = [i % 3 for i in range(n)]

    ss = ShardedSearcher(0, 0, d, mesh, dtype=jnp.float32)
    s1 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    ss.upsert_embeddings(ids, srcs, vecs)
    s1.upsert_embeddings(ids, srcs, vecs)

    qv = rng.standard_normal(d).astype(np.float32)
    h_s = ss.search_vector(qv, 12)
    h_1 = s1.search_vector(qv, 12)
    assert [i for i, _ in h_s] == [i for i, _ in h_1]
    np.testing.assert_allclose([v for _, v in h_s], [v for _, v in h_1], rtol=1e-5)

    # filtered + removal consistency
    h_s = ss.search_vector(qv, 12, source_ids=[1])
    h_1 = s1.search_vector(qv, 12, source_ids=[1])
    assert [i for i, _ in h_s] == [i for i, _ in h_1]

    ss.remove_items([h_s[0][0]])
    h_s2 = ss.search_vector(qv, 12, source_ids=[1])
    assert h_s2[0][0] == h_s[1][0]


def test_tensor_parallel_encoder():
    """TP-sharded params give the same embeddings as replicated params."""
    from perceive_tpu.models import EncoderArch, HeadConfig
    from perceive_tpu.models.encoder import init_params, make_encode_fn

    mesh = make_mesh(8, model_parallel=2)
    arch = EncoderArch(
        vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=32,
    )
    head = HeadConfig(pooling="mean", normalize=True)
    params = init_params(jax.random.PRNGKey(0), arch, head)
    fn = make_encode_fn(arch, head, compute_dtype=jnp.float32)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 100, (8, 16)).astype(np.int32))
    mask = jnp.ones_like(ids)
    types = jnp.zeros_like(ids)
    want = np.asarray(fn(params, ids, mask, types))

    with mesh:
        sp = shard_params(params, mesh)
        ids_s = jax.device_put(ids, batch_sharding(mesh))
        mask_s = jax.device_put(mask, batch_sharding(mesh))
        types_s = jax.device_put(types, batch_sharding(mesh))
        got = np.asarray(fn(sp, ids_s, mask_s, types_s))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tensor_parallel_structure_in_hlo():
    """TP must actually partition, not silently replicate (VERDICT r2 #8):
    per-device bytes of the Megatron-sharded leaves shrink by the TP factor,
    and the compiled module contains the all-reduce GSPMD inserts after
    o_proj / ffn_out (parity alone would also pass with replicated weights —
    slower, not wrong — so the structure is asserted directly)."""
    from perceive_tpu.models import EncoderArch, HeadConfig
    from perceive_tpu.models.encoder import init_params, make_encode_fn

    tp = 2
    mesh = make_mesh(8, model_parallel=tp)
    arch = EncoderArch(
        vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=32,
    )
    head = HeadConfig(pooling="mean", normalize=True)
    params = init_params(jax.random.PRNGKey(0), arch, head)
    sp = shard_params(params, mesh)

    # every TP-sharded leaf holds 1/tp of its elements per device
    from perceive_tpu.parallel.mesh import _LAYER_SPECS

    for name in _LAYER_SPECS:
        leaf = sp["layers"][name]
        shard = leaf.addressable_shards[0].data
        assert shard.size * tp == leaf.size, (
            f"{name}: per-device shard holds {shard.size} of {leaf.size} elements"
        )
    # a replicated leaf stays whole per device (embeddings)
    emb_leaf = sp["embed"]["word"]
    assert emb_leaf.addressable_shards[0].data.size == emb_leaf.size

    fn = make_encode_fn(arch, head, compute_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = jax.device_put(
        jnp.asarray(rng.integers(0, 100, (8, 16)).astype(np.int32)),
        batch_sharding(mesh),
    )
    with mesh:
        compiled = (
            jax.jit(fn)
            .lower(sp, ids, jnp.ones_like(ids), jnp.zeros_like(ids))
            .compile()
        )
    txt = compiled.as_text()
    assert "all-reduce" in txt, "no all-reduce in optimized HLO: TP is replicating"


def test_sharded_searcher_int8_and_build(tmp_db):
    """ShardedSearcher inherits build/retrieve/int8-rerank from Searcher."""
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.types import Source

    mesh = make_mesh(4)
    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((900, 24)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    with tmp_db.write() as conn:
        for i, v in enumerate(vecs):
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, f"d{i}", "", "c"),
            )
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version, embedding,
                     model_id, model_version, seq)
                   VALUES (?,?,?,0,0,?)""",
                (cur.lastrowid, 1, serialize_embedding(v), i + 1),
            )

    from perceive_tpu.parallel.search import ShardedSearcher

    ss = ShardedSearcher.build(tmp_db, 0, 0, 24, mesh, dtype=jnp.int8, engine="xla")
    s1 = Searcher.build(tmp_db, 0, 0, 24, engine="xla", dtype=jnp.float32, use_snapshot=False)
    assert len(ss.matrix) == 900

    q = vecs[123]
    got = ss.search_vector(q, 8)
    want = s1.search_vector(q, 8)
    assert [i for i, _ in got] == [i for i, _ in want]  # int8+rerank exact
    np.testing.assert_allclose([v for _, v in got], [v for _, v in want], rtol=1e-5)

    # retrieve path (inherited) round-trips through SQLite
    res = ss.search_vector_and_retrieve(tmp_db, q, 3)
    assert res and res[0].item.external_id == "d123"


def test_sharded_pallas_engine_slabbed():
    """Sharded scan with the pallas engine (interpret on CPU), large batch
    routing through the slab kernel per shard."""
    mesh = make_mesh(4)
    n, d, nq, k = 8192, 64, 256, 8
    rng = np.random.default_rng(5)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    source_ids = np.zeros(n, np.int32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    allowed = np.full(16, -9, np.int32)
    allowed[0] = -2

    dm = jax.device_put(jnp.asarray(matrix), rows_sharding(mesh))
    ds = jax.device_put(jnp.asarray(source_ids), rows_1d_sharding(mesh))
    vals, rows = sharded_scan_topk(
        mesh, dm, ds, jnp.asarray(q), jnp.asarray(allowed), k, engine="pallas"
    )
    scores = q @ matrix.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(scores, idx, 1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), idx)


def test_sharded_searcher_int4_packed(tmp_db):
    """int4 packed tier over the mesh: candidates from the per-chip packed
    scan, exactness restored by the inherited f32 rerank + escalation."""
    from perceive_tpu.db import add_source
    from perceive_tpu.index.matrix import serialize_embedding
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.types import Source

    mesh = make_mesh(4)
    src = add_source(tmp_db, Source(name="s", config={"type": "fs"}, location="/x"))
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((700, 24)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    with tmp_db.write() as conn:
        for i, v in enumerate(vecs):
            cur = conn.execute(
                "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
                (src.id, f"d{i}", "", "c"),
            )
            conn.execute(
                """INSERT INTO item_embeddings (item_id, item_index_version, embedding,
                     model_id, model_version, seq)
                   VALUES (?,?,?,0,0,?)""",
                (cur.lastrowid, 1, serialize_embedding(v), i + 1),
            )

    from perceive_tpu.parallel.search import ShardedSearcher

    ss = ShardedSearcher.build(tmp_db, 0, 0, 24, mesh, dtype="int4", engine="xla")
    s1 = Searcher.build(tmp_db, 0, 0, 24, engine="xla", dtype=jnp.float32, use_snapshot=False)
    assert ss.matrix.packed4 and len(ss.matrix) == 700

    for qi in (3, 123, 600):
        got = ss.search_vector(vecs[qi], 8)
        want = s1.search_vector(vecs[qi], 8)
        assert [i for i, _ in got] == [i for i, _ in want]
        np.testing.assert_allclose(
            [v for _, v in got], [v for _, v in want], rtol=1e-5
        )


def _tiny_model(seed=0, max_seq=32):
    from perceive_tpu.models import (
        EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab,
    )

    words = ["alpha", "beta", "gamma", "delta", "search", "vector"]
    vocab = tiny_test_vocab(words)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=max_seq)
    arch = EncoderArch(
        vocab_size=len(vocab), hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=max_seq,
    )
    return Model.random(
        arch, HeadConfig(pooling="mean", normalize=True), tok,
        seed=seed, compute_dtype=jnp.float32, attention_impl="xla", model_id=0,
    ), words


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_model_shard_over_parity(model_parallel):
    """Model.shard_over: DP (shard_map) and DPxTP (GSPMD) encode match the
    single-device encode bit-for-bit-ish on the 8-device CPU mesh."""
    m1, words = _tiny_model()
    m2, _ = _tiny_model()  # same seed -> same params
    texts = [" ".join(np.random.default_rng(i).choice(words, 5)) for i in range(16)]
    want = m1.materialize(m1.encode_dispatch(texts))

    m2.shard_over(make_mesh(8, model_parallel=model_parallel))
    got = m2.materialize(m2.encode_dispatch(texts))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # single query (bucket 1 does not divide the data axis): replicated path
    qv1 = m1.encode_query("alpha beta")
    qv2 = m2.encode_query("alpha beta")
    np.testing.assert_allclose(qv2, qv1, rtol=1e-4, atol=1e-5)

    # token-window dispatch (chunked ingest) takes the same mesh route
    win = [[5, 6, 7], [6, 7]]
    w1 = m1.materialize(m1.encode_dispatch_token_windows(win))
    w2 = m2.materialize(m2.encode_dispatch_token_windows(win))
    np.testing.assert_allclose(w2, w1, rtol=1e-4, atol=1e-5)


def test_multichip_ingest_scan(tmp_db, tmp_path):
    """Full scan pipeline with a mesh-sharded model feeding a ShardedSearcher
    — the multi-chip ingest story end-to-end on the CPU mesh."""
    from perceive_tpu.db import add_source
    from perceive_tpu.sources import scan_source
    from perceive_tpu.types import Source

    model, words = _tiny_model()
    mesh = make_mesh(8)
    model.shard_over(mesh)

    docs = tmp_path / "docs"
    docs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(40):
        (docs / f"d{i}.txt").write_text(" ".join(rng.choice(words, 12)))
    src = add_source(tmp_db, Source(name="m", config={"type": "fs"}, location=str(docs)))

    ss = ShardedSearcher(0, 0, model.dim, mesh, dtype=jnp.float32, engine="xla")
    stats, ok = scan_source(
        tmp_db, model, src, on_embeddings=ss.upsert_embeddings, embed_batch_size=16
    )
    assert ok and stats.added.value == 40 and len(ss.matrix) == 40

    q = model.encode_query(" ".join(rng.choice(words, 12)))
    hits = ss.search_vector(q, 5)
    assert len(hits) == 5 and all(s > -np.inf for _, s in hits)


def test_sharded_overfetch_exceeding_shard_rows():
    """An over-fetch bucket bigger than one shard's rows must clamp the
    per-chip top-k instead of crashing lax.top_k (review r2: kb > n_local).
    600 rows on a 4-device mesh = 512 rows/shard padded; int8's 4x rerank
    over-fetch at k=200 asks for 800+ candidates per chip."""
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.parallel.search import ShardedSearcher

    mesh = make_mesh(4)
    rng = np.random.default_rng(11)
    n, d = 600, 24
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    ss = ShardedSearcher(0, 0, d, mesh, dtype=jnp.int8, engine="xla")
    s1 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    for s in (ss, s1):
        s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)

    q = vecs[77]
    got = ss.search_vector(q, 200)
    want = s1.search_vector(q, 200)
    assert [i for i, _ in got] == [i for i, _ in want]
    np.testing.assert_allclose([v for _, v in got], [v for _, v in want], rtol=1e-5)


def test_sharded_auto_retier_mid_session(monkeypatch):
    """auto_retier works on the mesh searcher too: crossing the (patched)
    threshold restages the row-sharded matrix in the quantized tier — for
    int4 the TRANSPOSED (D/2, capacity) packed layout under the REVERSED
    sharding spec — and searches stay exact through the rerank."""
    import perceive_tpu.index.matrix as matmod
    from perceive_tpu.index.matrix import INT4

    # the mesh keys the auto rule on PER-CHIP rows (round 3): 40 rows / 4
    # chips = 10 stays bf16, 100 rows / 4 chips = 25 crosses the threshold
    monkeypatch.setattr(
        matmod, "auto_matrix_dtype",
        lambda n, padded_dim=384: INT4 if n > 12 else jnp.bfloat16,
    )
    rng = np.random.default_rng(5)
    d = 16
    vecs = rng.standard_normal((100, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    mesh = make_mesh(4)
    ss = ShardedSearcher(0, 0, d, mesh, dtype=jnp.bfloat16)
    ss.auto_retier = True
    ss.upsert_embeddings(list(range(1, 41)), [0] * 40, vecs[:40])
    assert not ss.matrix.quantized
    assert ss.search_vector(vecs[7], 1)[0][0] == 8

    ss.upsert_embeddings(list(range(41, 101)), [0] * 60, vecs[40:])
    assert ss.matrix.packed4  # re-tiered to int4 mid-session
    q = vecs[77] + 0.01 * rng.standard_normal(d).astype(np.float32)
    hits = ss.search_vector(q, 5)
    want = np.argsort(-(vecs @ q), kind="stable")[:5] + 1
    assert [i for i, _ in hits] == list(want)  # exact via the rerank
    # transposed packed layout, still sharded over the capacity axis
    v = ss.matrix.device_vectors
    assert v.dtype == jnp.uint8
    assert v.shape[0] == ss.matrix.padded_dim // 2
    spec = v.sharding.spec
    assert tuple(spec)[-1] is not None  # capacity (last) axis is sharded
