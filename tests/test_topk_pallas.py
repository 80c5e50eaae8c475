"""Pallas streaming top-k kernel vs. the XLA einsum+top_k oracle.

Property: the fused kernel is an EXACT scan, so at equal dtypes its (score,
row) results must match the oracle bit-for-bit (SURVEY.md §4's "property
tests for exact top-k ... vs jnp.dot + lax.top_k oracle").  Runs in Pallas
interpret mode on the CPU test platform; compiles for real on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.ops.topk import ALLOW_ALL, scan_topk_pallas


def _oracle(matrix, source_ids, q, allowed, k):
    qm = q.astype(matrix.dtype)
    scores = np.einsum("qd,nd->qn", np.asarray(qm, np.float32), np.asarray(matrix, np.float32))
    valid = source_ids >= 0
    if allowed[0] == ALLOW_ALL:
        src_ok = np.ones_like(valid)
    else:
        src_ok = np.isin(source_ids, allowed)
    scores = np.where((valid & src_ok)[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def _make(n, d, n_sources, seed, invalid_frac=0.1):
    rng = np.random.default_rng(seed)
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    source_ids = rng.integers(0, n_sources, n).astype(np.int32)
    source_ids[rng.random(n) < invalid_frac] = -1
    return matrix, source_ids


def _allowed(ids=None, f=16):
    a = np.full(f, -9, dtype=np.int32)
    if ids is None:
        a[0] = ALLOW_ALL
    else:
        a[: len(ids)] = ids
    return a


@pytest.mark.parametrize("nq,k", [(1, 10), (8, 64), (4, 128)])
def test_matches_oracle_f32(nq, k):
    n, d = 2048, 128
    matrix, source_ids = _make(n, d, 4, seed=nq * 100 + k)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    allowed = _allowed()

    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q), jnp.asarray(allowed), k
    )
    evals, erows = _oracle(matrix, source_ids, q, allowed, k)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)
    # rows may differ only on exact score ties (none with random floats)
    np.testing.assert_array_equal(np.asarray(rows), erows)


def test_source_filter():
    n, d, k = 1024, 64, 16
    matrix, source_ids = _make(n, d, 6, seed=7)
    q = np.random.default_rng(2).standard_normal((2, d)).astype(np.float32)
    allowed = _allowed([1, 3])

    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q), jnp.asarray(allowed), k
    )
    rows = np.asarray(rows)
    assert np.isin(source_ids[rows[np.asarray(vals) > -np.inf]], [1, 3]).all()
    evals, erows = _oracle(matrix, source_ids, q, allowed, k)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(rows, erows)


def test_fewer_matches_than_k():
    """When fewer rows match than k, the tail is (-inf, -1)."""
    n, d, k = 512, 64, 32
    matrix, source_ids = _make(n, d, 2, seed=3)
    source_ids[:] = -1
    source_ids[:5] = 0  # only 5 valid rows
    q = np.random.default_rng(4).standard_normal((1, d)).astype(np.float32)

    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q),
        jnp.asarray(_allowed()), k,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    assert np.isfinite(vals[0, :5]).all()
    assert set(rows[0, :5]) == set(range(5))
    assert (vals[0, 5:] == -np.inf).all()
    assert (rows[0, 5:] == -1).all()


def test_bf16_matches_bf16_oracle():
    n, d, k = 1024, 128, 10
    matrix, source_ids = _make(n, d, 3, seed=11, invalid_frac=0.0)
    mb = jnp.asarray(matrix).astype(jnp.bfloat16)
    q = np.random.default_rng(5).standard_normal((2, d)).astype(np.float32)

    vals, rows = scan_topk_pallas(
        mb, jnp.asarray(source_ids), jnp.asarray(q), jnp.asarray(_allowed()), k
    )
    # oracle in the same bf16 precision
    scores = np.einsum(
        "qd,nd->qn",
        np.asarray(jnp.asarray(q).astype(jnp.bfloat16), np.float32),
        np.asarray(mb, np.float32),
    )
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, idx, axis=1), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(rows), idx)


def test_searcher_pallas_engine_end_to_end(tmp_db):
    """Searcher(engine='pallas') returns the same hits as engine='xla'."""
    from perceive_tpu.index.searcher import Searcher

    n, d = 600, 32
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    item_ids = list(range(1, n + 1))
    source_ids = [i % 3 for i in range(n)]

    s_x = Searcher(1, 0, d, engine="xla")
    s_p = Searcher(1, 0, d, engine="pallas")
    for s in (s_x, s_p):
        s.upsert_embeddings(item_ids, source_ids, vecs)

    qv = rng.standard_normal(d).astype(np.float32)
    hx = s_x.search_vector(qv, 15)
    hp = s_p.search_vector(qv, 15)
    assert [i for i, _ in hx] == [i for i, _ in hp]
    np.testing.assert_allclose([v for _, v in hx], [v for _, v in hp], rtol=1e-3)

    hx = s_x.search_vector(qv, 15, source_ids=[1])
    hp = s_p.search_vector(qv, 15, source_ids=[1])
    assert [i for i, _ in hx] == [i for i, _ in hp]


def test_query_slabbing():
    """Batches beyond MAX_QUERY_SLAB run as consecutive slabs, same results."""
    from perceive_tpu.ops import topk as T

    n, d, k = 1024, 64, 8
    matrix, source_ids = _make(n, d, 3, seed=21, invalid_frac=0.0)
    q = np.random.default_rng(6).standard_normal((20, d)).astype(np.float32)
    allowed = _allowed()

    orig = T.MAX_QUERY_SLAB
    try:
        T.MAX_QUERY_SLAB = 8  # force 3 slabs
        vals, rows = T.scan_topk_pallas(
            jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q), jnp.asarray(allowed), k
        )
    finally:
        T.MAX_QUERY_SLAB = orig
    evals, erows = _oracle(matrix, source_ids, q, allowed, k)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), erows)


def test_slabbed_kernel_matches_oracle():
    """The large-batch (query-slabbed) kernel path is exact too."""
    n, d, k, nq = 2048, 128, 10, 256  # nq >= 2*QUERY_SLAB triggers the slab path
    matrix, source_ids = _make(n, d, 4, seed=33)
    q = np.random.default_rng(8).standard_normal((nq, d)).astype(np.float32)
    allowed = _allowed()
    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q), jnp.asarray(allowed), k
    )
    evals, erows = _oracle(matrix, source_ids, q, allowed, k)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), erows)


def test_slabbed_kernel_source_filter():
    n, d, k, nq = 1024, 64, 8, 256
    matrix, source_ids = _make(n, d, 6, seed=34)
    q = np.random.default_rng(9).standard_normal((nq, d)).astype(np.float32)
    allowed = _allowed([2, 5])
    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q), jnp.asarray(allowed), k
    )
    evals, erows = _oracle(matrix, source_ids, q, allowed, k)
    np.testing.assert_allclose(np.asarray(vals), evals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rows), erows)


def test_prefix_sweep_pallas_kernels_match_oracle():
    """n_sweep clamps every Pallas wrapper's grid to the live prefix: rows
    past it are never read, and results match the oracle restricted to the
    prefix — covers the bf16 unsorted kernel the round-3 review found
    missing the clamp (engine-level companion of the searcher-level
    test_prefix_sweep_exact_past_sweep_min, which ran XLA-only)."""
    import jax

    from perceive_tpu.ops.topk import (
        pallas_topk_int4_unsorted,
        pallas_topk_int8_unsorted,
        pallas_topk_unsorted,
        quantize_queries,
    )

    n, ns, d, k = 2048, 1024, 64, 16
    matrix, source_ids = _make(n, d, 3, seed=5)
    # poison the dead tail with huge values: if any kernel reads past
    # n_sweep, these rows win and the oracle check fails
    matrix[ns:] = 100.0
    source_ids[ns:] = 0  # live-looking, so only the grid clamp excludes them
    q = np.random.default_rng(6).standard_normal((2, d)).astype(np.float32)
    allowed = _allowed()
    want_v, want_r = _oracle(matrix[:ns], source_ids[:ns], q, allowed, k)

    mj = jnp.asarray(matrix, jnp.bfloat16)
    src2d = jnp.asarray(source_ids).reshape(1, n)
    vals, rows = pallas_topk_unsorted(
        mj, src2d, jnp.asarray(q, jnp.bfloat16), jnp.asarray(allowed), k, True, ns
    )
    svals, perm = jax.lax.top_k(vals, k)
    srows = np.take_along_axis(np.asarray(rows), np.asarray(perm), axis=1)
    assert set(srows[0].tolist()) == set(want_r[0].tolist())
    assert (np.asarray(srows) < ns).all()

    qi8, qsc = quantize_queries(jnp.asarray(q))
    sc2d = jnp.ones((1, n), jnp.float32)
    m8 = jnp.asarray(np.clip(matrix, -1, 1) * 127, jnp.int8)
    vals, rows = pallas_topk_int8_unsorted(
        m8, sc2d, src2d, qi8, qsc, jnp.asarray(allowed), k, True, ns
    )
    assert (np.asarray(rows)[np.asarray(rows) >= 0] < ns).all()
    # int4: transposed-packed poison tail likewise never surfaces
    lo = (np.clip(matrix[:, : d // 2], -0.9, 0.9) * 7 + 8).astype(np.uint8)
    hi = (np.clip(matrix[:, d // 2 :], -0.9, 0.9) * 7).astype(np.int8).astype(np.uint8) & 15
    p4 = jnp.asarray((lo | (hi << 4)).T)
    vals, rows = pallas_topk_int4_unsorted(
        p4, sc2d, src2d, qi8, qsc, jnp.asarray(allowed), k, True, ns
    )
    assert (np.asarray(rows)[np.asarray(rows) >= 0] < ns).all()


def test_large_unaligned_batch_pads_to_slab():
    """Batches >= 2*QUERY_SLAB that are not slab-aligned are zero-padded up
    to the next slab multiple and routed through the SLABBED kernel — the
    flat kernel's (Q, TILE) scratch blows scoped VMEM past ~Q=2k (measured
    on hardware: Q=2040 failed Mosaic compilation before the _slab_pad
    route, review r3).  Results must still match the oracle exactly and
    carry the caller's Q."""
    n, d, nq, k = 2048, 128, 260, 16  # 260 = 2*128 + 4: unaligned, large
    matrix, source_ids = _make(n, d, 4, seed=77)
    rng = np.random.default_rng(7)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    allowed = _allowed()
    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q),
        jnp.asarray(allowed), k,
    )
    assert vals.shape == (nq, k) and rows.shape == (nq, k)
    ovals, orows = _oracle(matrix, source_ids, q, allowed, k)
    np.testing.assert_array_equal(np.asarray(rows), orows)
    np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-6)
