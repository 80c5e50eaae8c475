"""Property test: the fused scan kernel is exact for ANY shape/filter/k.

Randomized counterpart of the fixed-case oracle tests in
tests/test_topk_pallas.py — hypothesis drives row counts (512-aligned like
EmbeddingMatrix capacities), query counts, k, tombstone density, duplicate
scores (ties), and source filters, asserting bit-equality of the score SET
against jnp.einsum + lax.top_k (the exactness contract of SURVEY.md §6:
recall parity by construction with the reference's search.rs:157-182).
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from perceive_tpu.ops.topk import ALLOW_ALL, scan_topk_pallas


def _oracle(matrix, source_ids, q, allowed, k):
    scores = q.astype(np.float32) @ matrix.T.astype(np.float32)
    ok = source_ids >= 0
    if allowed[0] != ALLOW_ALL:
        ok &= np.isin(source_ids, allowed)
    scores = np.where(ok[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1)


@settings(max_examples=12, deadline=None)
@given(
    n_tiles=st.integers(1, 3),
    nq=st.integers(1, 5),
    k=st.integers(1, 24),
    n_sources=st.integers(1, 4),
    tombstones=st.floats(0.0, 0.4),
    filtered=st.booleans(),
    ties=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_kernel_matches_oracle(n_tiles, nq, k, n_sources, tombstones, filtered, ties, seed):
    rng = np.random.default_rng(seed)
    n, d = 512 * n_tiles, 32
    matrix = rng.standard_normal((n, d)).astype(np.float32)
    if ties:  # duplicate rows force exact tie-handling in the merge loop
        dup = rng.integers(0, n, n // 4)
        matrix[dup] = matrix[dup[0]]
    source_ids = rng.integers(0, n_sources, n).astype(np.int32)
    source_ids[rng.random(n) < tombstones] = -1
    q = rng.standard_normal((nq, d)).astype(np.float32)

    allowed = np.full(16, -9, np.int32)
    if filtered:
        allowed[0] = 0  # sources {0}
    else:
        allowed[0] = ALLOW_ALL

    vals, rows = scan_topk_pallas(
        jnp.asarray(matrix), jnp.asarray(source_ids), jnp.asarray(q),
        jnp.asarray(allowed), k,
    )
    vals, rows = np.asarray(vals), np.asarray(rows)
    want = _oracle(matrix, source_ids, q, allowed, k)

    np.testing.assert_allclose(vals, want, rtol=1e-6, atol=1e-6)
    # returned rows actually produce the returned scores and honor the filter
    for qi in range(nq):
        for slot in range(k):
            r = rows[qi, slot]
            if vals[qi, slot] == -np.inf:
                assert r == -1
            else:
                assert source_ids[r] >= 0
                if filtered:
                    assert source_ids[r] == 0
                np.testing.assert_allclose(
                    float(q[qi] @ matrix[r]), vals[qi, slot], rtol=1e-5
                )


@settings(max_examples=8, deadline=None)
@given(
    n_tiles=st.integers(1, 2),
    nq=st.integers(1, 4),
    k=st.integers(1, 16),
    tombstones=st.floats(0.0, 0.3),
    filtered=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_int8_kernel_matches_dequant_oracle(n_tiles, nq, k, tombstones, filtered, seed):
    """Randomized int8 kernel exactness vs the dequantized-score oracle."""
    from perceive_tpu.ops.topk import quantize_queries, scan_topk_pallas_int8

    rng = np.random.default_rng(seed)
    n, d = 512 * n_tiles, 32
    m8 = rng.integers(-127, 128, (n, d)).astype(np.int8)
    scales = (rng.random(n).astype(np.float32) + 0.5) / 127.0
    source_ids = rng.integers(0, 3, n).astype(np.int32)
    source_ids[rng.random(n) < tombstones] = -1
    q = rng.standard_normal((nq, d)).astype(np.float32)
    allowed = np.full(16, -9, np.int32)
    allowed[0] = 0 if filtered else ALLOW_ALL

    vals, rows = scan_topk_pallas_int8(
        jnp.asarray(m8), jnp.asarray(scales), jnp.asarray(source_ids),
        jnp.asarray(q), jnp.asarray(allowed), k,
    )
    qi8, qscale = quantize_queries(jnp.asarray(q))
    scores = (
        np.asarray(qi8, np.float32) @ m8.T.astype(np.float32)
        * scales[None, :] * np.asarray(qscale)
    )
    ok = source_ids >= 0
    if filtered:
        ok &= source_ids == 0
    scores = np.where(ok[None, :], scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, idx, axis=1), rtol=1e-5, atol=1e-6
    )


@settings(max_examples=8, deadline=None)
@given(
    n_tiles=st.integers(1, 2),
    nq=st.integers(1, 3),
    k=st.integers(1, 16),
    filtered=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_int4_kernel_matches_xla_unpack(n_tiles, nq, k, filtered, seed):
    """Randomized int4 packed-kernel equivalence with the XLA unpack engine
    (both produce the same quantized candidate ranking)."""
    from perceive_tpu.index.matrix import INT4, EmbeddingMatrix
    from perceive_tpu.index.searcher import _scan_topk_xla_int4
    from perceive_tpu.ops.topk import scan_topk_pallas_int4

    rng = np.random.default_rng(seed)
    n, d = 512 * n_tiles, 64
    m = EmbeddingMatrix(d, dtype=INT4, capacity=n)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    srcs = rng.integers(0, 2, n).astype(np.int32)
    m.upsert(list(range(1, n + 1)), srcs.tolist(), vecs)
    packed, src, scales = m.device_view()

    q = rng.standard_normal((nq, d)).astype(np.float32)
    if m.padded_dim > d:  # kernels take lane-aligned queries (searcher.py pads)
        q = np.concatenate([q, np.zeros((nq, m.padded_dim - d), q.dtype)], axis=1)
    allowed = np.full(16, -9, np.int32)
    allowed[0] = 0 if filtered else ALLOW_ALL

    pv, pr = scan_topk_pallas_int4(
        packed, scales, src, jnp.asarray(q), jnp.asarray(allowed), k
    )
    xv, xr = _scan_topk_xla_int4(
        packed, scales, src, jnp.asarray(q), jnp.asarray(allowed), k
    )
    np.testing.assert_allclose(np.asarray(pv), np.asarray(xv), rtol=1e-5, atol=1e-6)
    # row agreement wherever scores are not tied with a neighbor slot
    pvn, xvn = np.asarray(pv), np.asarray(xv)
    strict = np.ones_like(pvn, bool)
    strict[:, 1:] &= pvn[:, 1:] != pvn[:, :-1]
    strict[:, :-1] &= pvn[:, :-1] != pvn[:, 1:]
    np.testing.assert_array_equal(
        np.asarray(pr)[strict], np.asarray(xr)[strict]
    )
