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
