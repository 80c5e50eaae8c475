"""Int8 quantized matrix: kernel parity, recall, and exact rerank."""

import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.index.searcher import Searcher
from perceive_tpu.ops.topk import ALLOW_ALL, quantize_queries, scan_topk_pallas_int8


def _unit_rows(n, d, seed):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_quantize_queries_roundtrip():
    q = np.random.default_rng(0).standard_normal((4, 64)).astype(np.float32)
    qi8, scale = quantize_queries(jnp.asarray(q))
    back = np.asarray(qi8, np.float32) * np.asarray(scale)
    np.testing.assert_allclose(back, q, atol=np.abs(q).max() / 127 + 1e-6)


def test_int8_kernel_matches_dequant_oracle():
    n, d, k = 1024, 128, 10
    vecs = _unit_rows(n, d, 1)
    scales = np.maximum(np.abs(vecs).max(axis=1), 1e-12) / 127.0
    mi8 = np.clip(np.rint(vecs / scales[:, None]), -127, 127).astype(np.int8)
    src = np.zeros(n, np.int32)
    q = _unit_rows(2, d, 2)
    allowed = np.full(16, -9, np.int32)
    allowed[0] = ALLOW_ALL

    vals, rows = scan_topk_pallas_int8(
        jnp.asarray(mi8), jnp.asarray(scales.astype(np.float32)), jnp.asarray(src),
        jnp.asarray(q), jnp.asarray(allowed), k,
    )
    # oracle: same dequantized arithmetic on host
    qi8, qs = quantize_queries(jnp.asarray(q))
    scores = (np.asarray(qi8, np.int32) @ mi8.astype(np.int32).T).astype(np.float32)
    scores *= scales[None, :].astype(np.float32) * np.asarray(qs)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(scores, idx, 1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rows), idx)


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_int8_searcher_exact_after_rerank(engine):
    """Int8 scan + f32 rerank returns the same hits as a full-f32 searcher."""
    n, d, k = 1500, 64, 10
    vecs = _unit_rows(n, d, 3)
    ids = list(range(1, n + 1))
    srcs = [i % 3 for i in range(n)]

    s_f32 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    s_i8 = Searcher(0, 0, d, dtype=jnp.int8, engine=engine)
    s_f32.upsert_embeddings(ids, srcs, vecs)
    s_i8.upsert_embeddings(ids, srcs, vecs)

    rng = np.random.default_rng(4)
    for qi in range(5):
        q = _unit_rows(1, d, 100 + qi)[0]
        want = s_f32.search_vector(q, k)
        got = s_i8.search_vector(q, k)
        assert [i for i, _ in got] == [i for i, _ in want]
        np.testing.assert_allclose([v for _, v in got], [v for _, v in want], rtol=1e-5)

    # filtered path too
    q = _unit_rows(1, d, 999)[0]
    want = s_f32.search_vector(q, k, source_ids=[1])
    got = s_i8.search_vector(q, k, source_ids=[1])
    assert [i for i, _ in got] == [i for i, _ in want]


def test_int8_incremental_update():
    d = 32
    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    v = _unit_rows(600, d, 5)
    s.upsert_embeddings(list(range(600)), [0] * 600, v)
    q = v[42]
    assert s.search_vector(q, 1)[0][0] == 42
    # overwrite row 42 away, add an exact match at id 1000
    s.upsert_embeddings([42], [0], _unit_rows(1, d, 6))
    s.upsert_embeddings([1000], [0], q.reshape(1, -1))
    assert s.search_vector(q, 1)[0][0] == 1000


def test_int8_with_chunked_documents():
    """int8 rerank and chunk dedupe compose: exact item ranking vs f32."""
    d, k = 48, 6
    rng = np.random.default_rng(7)
    # 200 items, every 5th has 3 chunks
    pairs, vecs, srcs = [], [], []
    for i in range(1, 201):
        n_chunks = 3 if i % 5 == 0 else 1
        for c in range(n_chunks):
            pairs.append((i, c))
            v = rng.standard_normal(d).astype(np.float32)
            vecs.append(v / np.linalg.norm(v))
            srcs.append(i % 2)
    vecs = np.stack(vecs)

    s_f32 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    s_i8 = Searcher(0, 0, d, dtype=jnp.int8, engine="pallas")
    s_f32.upsert_embeddings(pairs, srcs, vecs)
    s_i8.upsert_embeddings(pairs, srcs, vecs)
    assert s_i8.matrix.quantized and s_i8.matrix.multi_chunk_groups == 40

    for qi in range(4):
        q = rng.standard_normal(d).astype(np.float32)
        q /= np.linalg.norm(q)
        want = s_f32.search_vector(q, k)
        got = s_i8.search_vector(q, k)
        assert [i for i, _ in got] == [i for i, _ in want]
        assert len({i for i, _ in got}) == k  # deduped items
        np.testing.assert_allclose([v for _, v in got], [v for _, v in want], rtol=1e-5)


def test_int8_slabbed_kernel_matches_dequant_oracle():
    """Large-batch int8 path (query-slabbed) stays exact vs the dequant oracle."""
    n, d, k, nq = 1024, 128, 8, 256
    vecs = _unit_rows(n, d, 31)
    scales = np.maximum(np.abs(vecs).max(axis=1), 1e-12) / 127.0
    mi8 = np.clip(np.rint(vecs / scales[:, None]), -127, 127).astype(np.int8)
    src = np.zeros(n, np.int32)
    q = _unit_rows(nq, d, 32)
    allowed = np.full(16, -9, np.int32)
    allowed[0] = ALLOW_ALL

    vals, rows = scan_topk_pallas_int8(
        jnp.asarray(mi8), jnp.asarray(scales.astype(np.float32)), jnp.asarray(src),
        jnp.asarray(q), jnp.asarray(allowed), k,
    )
    qi8, qs = quantize_queries(jnp.asarray(q))
    scores = (np.asarray(qi8, np.int32) @ mi8.astype(np.int32).T).astype(np.float32)
    scores *= scales[None, :].astype(np.float32) * np.asarray(qs)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(np.asarray(vals), np.take_along_axis(scores, idx, 1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rows), idx)


def test_rerank_margin_sigma_escalates(monkeypatch):
    """PERCEIVE_TPU_RERANK_MARGIN_SIGMA adds a quantization-noise margin to
    the escalation trigger: an absurdly large sigma must force deeper
    fetches (up to the cap) while results stay exact vs the f32 oracle."""
    rng = np.random.default_rng(3)
    n, d, k = 512, 64, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    s_f32 = Searcher(0, 0, d, dtype=jnp.float32, engine="xla")
    s_i8 = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    for s in (s_f32, s_i8):
        s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)

    q = vecs[7] + 0.01 * rng.standard_normal(d).astype(np.float32)

    sweeps = []
    orig = s_i8._device_scan

    def spy(qp, kb, allowed, engine, **kw):
        sweeps.append(kb)
        return orig(qp, kb, allowed, engine, **kw)

    s_i8._device_scan = spy

    monkeypatch.setenv("PERCEIVE_TPU_RERANK_MARGIN_SIGMA", "1000")
    got = s_i8.search_vector(q, k)
    want = s_f32.search_vector(q, k)
    assert [i for i, _ in got] == [i for i, _ in want]
    # the huge margin can never be satisfied, so the fetch must escalate
    # until everything fetchable was fetched
    assert len(sweeps) >= 2 and max(sweeps) >= n

    # sigma=0 (default): single sweep
    sweeps.clear()
    monkeypatch.setenv("PERCEIVE_TPU_RERANK_MARGIN_SIGMA", "0")
    s_i8.search_vector(q, k)
    assert len(sweeps) == 1
