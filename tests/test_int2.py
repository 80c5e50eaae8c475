"""Int2 coarse-to-fine tier (round 3): 0.25 bytes/dim sweep + in-jit int4
candidate rerank + the searcher's f32 rerank / escalation on top.

The tier exists because the single-query sweep is HBM-bandwidth-bound
(BENCH_NOTES.md): halving int4's bytes halves the 10M-row p50 again.  The
2-bit scores alone are too noisy for a 128-candidate rerank, hence the
coarse(4096)->fine(int4)->f32 ladder (ops/topk.py int2 section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.index.matrix import INT2, EmbeddingMatrix
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.ops import topk as topk_mod
from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    quantize_queries,
    scan_int2_coarse_fine,
    unpack_int2_xla,
    xla_scores_int2,
)


def _unit_rows(rng, n, d):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _allow_all():
    allowed = np.full(16, -9, np.int32)
    allowed[0] = ALLOW_ALL
    return allowed


def test_quantize2_pack_roundtrip():
    m = EmbeddingMatrix(256, dtype=INT2)
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((64, 256)).astype(np.float32)
    packed, scales = m._quantize2(rows)
    assert packed.shape == (64, 64) and packed.dtype == np.uint8
    # decode through the shared XLA unpack (the one the engines use)
    levels = np.asarray(unpack_int2_xla(jnp.asarray(packed.T)))  # (256, 64)
    assert set(np.unique(levels)) <= {-3, -1, 1, 3}
    recon = levels.T * scales[:, None]
    # interior dims land within one grid step s; clipped tails within 3s+|v|
    err = np.abs(recon - rows)
    inside = np.abs(rows) <= 3 * scales[:, None]
    assert err[inside].max() <= (scales.max() + 1e-6)
    # MSE near the 0.119*var optimum for gaussian rows (allow slack)
    assert np.mean(err**2) / np.mean(rows**2) < 0.16


def test_int2_xla_scores_match_numpy():
    rng = np.random.default_rng(1)
    n, d = 512, 128
    m = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, scales = m._quantize2(rows)
    q = _unit_rows(rng, 3, d)
    qi8, qscale = quantize_queries(jnp.asarray(q))
    got = np.asarray(
        xla_scores_int2(jnp.asarray(packed.T.copy()), jnp.asarray(scales), qi8, qscale)
    )
    levels = np.asarray(unpack_int2_xla(jnp.asarray(packed.T.copy()))).astype(np.float64)
    want = (np.asarray(qi8).astype(np.float64) @ levels) * scales[None, :] * np.asarray(qscale)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_int2_pallas_interpret_matches_xla():
    """The Pallas coarse kernel (interpret mode off-TPU) and the XLA unpack
    fallback produce identical masked coarse scores."""
    from perceive_tpu.ops.topk import pallas_int2_scores

    rng = np.random.default_rng(2)
    n, d = 1024, 128
    m = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, scales = m._quantize2(rows)
    packed_t = jnp.asarray(packed.T.copy())
    src = np.zeros(n, np.int32)
    src[17:40] = -1  # tombstones
    q = _unit_rows(rng, 2, d)
    qi8, qscale = quantize_queries(jnp.asarray(q))
    allowed = jnp.asarray(_allow_all())
    got = np.asarray(
        pallas_int2_scores(
            packed_t, jnp.asarray(scales.reshape(1, n)),
            jnp.asarray(src.reshape(1, n)), qi8, qscale, allowed, interpret=True,
        )
    )
    want = np.asarray(xla_scores_int2(packed_t, jnp.asarray(scales), qi8, qscale)).copy()
    want[:, src < 0] = -np.inf
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_int2_coarse_fine_exact_candidates():
    """At a corpus larger than the coarse depth, the coarse-to-fine scan's
    candidate set plus the searcher-style f32 rerank recovers the exact
    top-k (the real guarantee: oracle winners inside the fine fetch)."""
    rng = np.random.default_rng(3)
    n, d, k = 8192, 128, 10  # lane-aligned: direct _quantize2 calls skip padding
    mm = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, s2 = mm._quantize2(rows)
    fine, s4 = mm._quantize4(rows)
    q = _unit_rows(rng, 8, d)
    src = np.zeros(n, np.int32)

    vals, rws, floor = jax.jit(
        lambda *a: scan_int2_coarse_fine(*a, 128, engine="xla")
    )(
        jnp.asarray(packed.T.copy()), jnp.asarray(s2), jnp.asarray(fine.T.copy()),
        jnp.asarray(s4), jnp.asarray(src), jnp.asarray(q),
        jnp.asarray(_allow_all()),
    )
    vals, rws, floor = np.asarray(vals), np.asarray(rws), np.asarray(floor)
    assert np.isfinite(floor).all()  # coarse depth (4096) < n: real floor
    exact = q @ rows.T
    oracle = np.argsort(-exact, axis=1)[:, :k]
    for qi in range(len(q)):
        cand = set(rws[qi][np.isfinite(vals[qi])].tolist())
        missing = [r for r in oracle[qi] if r not in cand]
        assert not missing, f"query {qi} lost oracle rows {missing}"


@pytest.mark.parametrize("fine", ["int8", "int4"])
def test_int2_searcher_exact_topk_vs_oracle(fine, monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", fine)
    rng = np.random.default_rng(4)
    n, d, k = 8192, 64, 10
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    assert s.matrix.fine_bits == (8 if fine == "int8" else 4)
    rows = _unit_rows(rng, n, d)
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, rows)
    q = _unit_rows(rng, 4, d)
    exact = q @ rows.T
    for qi in range(len(q)):
        hits = s.search_vector(q[qi], k)
        got = [iid for iid, _ in hits]
        want = (np.argsort(-exact[qi])[:k] + 1).tolist()
        assert got == want, f"query {qi}: {got} != {want}"
        np.testing.assert_allclose(
            [sc for _, sc in hits], np.sort(exact[qi])[::-1][:k], rtol=1e-5
        )


def test_int2_source_filter_and_tombstones():
    rng = np.random.default_rng(5)
    n, d, k = 4096, 64, 5
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    rows = _unit_rows(rng, n, d)
    src = (np.arange(n) % 3).astype(int)
    s.upsert_embeddings(list(range(1, n + 1)), src.tolist(), rows)
    s.remove_items([1, 2, 3])
    q = _unit_rows(rng, 1, d)[0]
    hits = s.search_vector(q, k, source_ids=[1])
    assert len(hits) == k
    exact = rows @ q
    exact[src != 1] = -np.inf
    exact[:3] = -np.inf
    want = (np.argsort(-exact)[:k] + 1).tolist()
    assert [iid for iid, _ in hits] == want


def test_int2_retier_mid_session():
    """int8 -> int2 retier re-quantizes from the mirror; search stays exact
    and the fine companion arrays exist."""
    rng = np.random.default_rng(6)
    n, d, k = 4096, 64, 10
    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    rows = _unit_rows(rng, n, d)
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, rows)
    s.matrix.retier(INT2)
    assert s.matrix.packed2 and s.matrix.quant_bits == 2
    vectors, _, scales = s.matrix.device_view()
    p2, fine = vectors
    s2, s4 = scales
    assert p2.shape == (s.matrix.padded_dim // 4, s.matrix.capacity)
    # tiny capacity fits the int8-companion budget, so auto stages the
    # (D, cap) int8 throughput companion (int2_fine_bits)
    assert s.matrix.fine_bits == 8
    assert fine.dtype == jnp.int8
    assert fine.shape == (s.matrix.padded_dim, s.matrix.capacity)
    q = _unit_rows(rng, 1, d)[0]
    exact = rows @ q
    want = (np.argsort(-exact)[:k] + 1).tolist()
    assert [iid for iid, _ in s.search_vector(q, k)] == want


def test_int2_coarse_floor_triggers_escalation(monkeypatch):
    """The coarse floor is a bound on rows OUTSIDE the candidate set: when
    the k-th exact score cannot clear it, _scan must re-fetch deeper.
    Force the floor high on the first sweep and verify the deepening
    happens (and that the final result is the exact top-k)."""
    rng = np.random.default_rng(7)
    n, d, k = 4096, 64, 10
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    rows = _unit_rows(rng, n, d)
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, rows)

    scans = {"n": 0}
    orig = Searcher._device_scan

    def forcing(self, *a, **kw):
        scans["n"] += 1
        vals, rws, floor = orig(self, *a, **kw)
        if scans["n"] == 1:
            # claim an outside row could score higher than anything fetched
            floor = np.full(vals.shape[0], 1e9, np.float32)
        return vals, rws, floor

    monkeypatch.setattr(Searcher, "_device_scan", forcing)
    q = _unit_rows(rng, 1, d)[0]
    exact = rows @ q
    want = (np.argsort(-exact)[:k] + 1).tolist()
    assert [iid for iid, _ in s.search_vector(q, k)] == want
    assert scans["n"] >= 2, "an unbeatable coarse floor must escalate"
    # the observability counters saw it (stats / /status / /metrics source)
    assert s.escalations >= 1
    assert s.scan_calls >= 1


@pytest.mark.parametrize("fine", ["int8", "int4"])
def test_int2_incremental_sync_scatter(fine, monkeypatch):
    """Delta sync scatters BOTH the coarse and fine device arrays (in
    whichever companion dtype is staged)."""
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", fine)
    rng = np.random.default_rng(8)
    n, d = 2048, 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    rows = _unit_rows(rng, n, d)
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, rows)
    s.matrix.sync()  # full upload
    v2 = _unit_rows(rng, 1, d)
    s.upsert_embeddings([5], [0], v2)  # small delta -> scatter path
    q = v2[0]
    hits = s.search_vector(q, 1)
    assert hits[0][0] == 5
    np.testing.assert_allclose(hits[0][1], float(v2[0] @ v2[0]), rtol=1e-5)


# The fused text-program coverage for the int2 tier lives in
# tests/test_fused.py (INT2 added to its dtype parametrization).


@pytest.mark.parametrize("fine_bits", [8, 4])
def test_int2_window_select_superset_and_floor(fine_bits):
    """The window-cut select (select="window") returns a candidate set that
    is a strict superset of the exact path's at equal kc (the guarantee in
    _select_window_fine's docstring), its floor lower-bounds the exact
    path's floor while still upper-bounding every EXCLUDED row's coarse
    score, and tombstoned rows never surface."""
    from perceive_tpu.ops.topk import xla_scores_int2

    rng = np.random.default_rng(11)
    # nw=512 windows > kc; d lane-aligned: direct _quantize* calls skip padding
    n, d, k, kc = 128 * 512, 128, 10, 256
    mm = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, s2 = mm._quantize2(rows)
    if fine_bits == 8:
        finem, s4 = mm._quantize(rows)
    else:
        finem, s4 = mm._quantize4(rows)
    q = _unit_rows(rng, 3, d)
    src = np.zeros(n, np.int32)
    src[50:300] = -1  # tombstones spanning whole windows and partials
    args = (
        jnp.asarray(packed.T.copy()), jnp.asarray(s2),
        jnp.asarray(finem.T.copy()), jnp.asarray(s4),
        jnp.asarray(src), jnp.asarray(q), jnp.asarray(_allow_all()),
    )

    def run(select):
        v, r, f = jax.jit(
            lambda *a: scan_int2_coarse_fine(
                *a, k, k_coarse=kc, engine="xla",
                fine_bits=fine_bits, select=select,
            )
        )(*args)
        return np.asarray(v), np.asarray(r), np.asarray(f)

    ev, er, ef = run("exact")
    wv, wr, wf = run("window")
    qi8, qsc = quantize_queries(jnp.asarray(q))
    coarse = np.asarray(
        xla_scores_int2(jnp.asarray(packed.T.copy()), jnp.asarray(s2), qi8, qsc)
    ).copy()
    coarse[:, src < 0] = -np.inf
    nw = n // 128
    for qi in range(len(q)):
        ret = wr[qi][np.isfinite(wv[qi])]
        assert not set(ret.tolist()) & set(range(50, 300)), "tombstone surfaced"
        # window floor <= exact floor (kc-th wmax is some row's score and
        # distinct windows' maxes are distinct rows), and the top-k fine
        # scores of the superset dominate the exact path's elementwise
        assert wf[qi] <= ef[qi] + 1e-6
        assert (wv[qi] >= ev[qi] - 1e-5).all()
        # floor = the kc-th window max, so every row OUTSIDE the selected
        # windows is bounded by it
        wm = coarse[qi].reshape(nw, 128).max(axis=1)
        floor_np = np.sort(wm)[::-1][kc - 1]
        assert abs(wf[qi] - floor_np) <= 1e-6
        # every returned row lives in a selected window
        assert (wm[ret // 128] >= floor_np - 1e-6).all()


@pytest.mark.parametrize("fine_bits", [8, 4])
def test_int2_threshold_select_superset_and_floor(fine_bits):
    """select="threshold" (the sort-free compaction variant; kept
    selectable for higher-bandwidth parts, measured -0.14 ms SLOWER than
    exact on the bench chip — BENCH_NOTES round-3): candidates contain the
    exact path's, the floor equals the kc-th window max (numpy-checked) and
    soundly bounds every row outside the candidate set, and tombstones
    never surface."""
    from perceive_tpu.ops.topk import _INT2_CAP_SLACK, xla_scores_int2

    rng = np.random.default_rng(12)
    # nw=512 windows > kc; d lane-aligned: direct _quantize* calls skip padding
    n, d, k, kc = 128 * 512, 128, 10, 256
    mm = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, s2 = mm._quantize2(rows)
    if fine_bits == 8:
        finem, s4 = mm._quantize(rows)
    else:
        finem, s4 = mm._quantize4(rows)
    q = _unit_rows(rng, 3, d)
    src = np.zeros(n, np.int32)
    src[50:300] = -1
    args = (
        jnp.asarray(packed.T.copy()), jnp.asarray(s2),
        jnp.asarray(finem.T.copy()), jnp.asarray(s4),
        jnp.asarray(src), jnp.asarray(q), jnp.asarray(_allow_all()),
    )

    def run(select):
        v, r, f = jax.jit(
            lambda *a: scan_int2_coarse_fine(
                *a, k, k_coarse=kc, engine="xla",
                fine_bits=fine_bits, select=select,
            )
        )(*args)
        return np.asarray(v), np.asarray(r), np.asarray(f)

    ev, er, ef = run("exact")
    tv, tr, tf = run("threshold")
    qi8, qsc = quantize_queries(jnp.asarray(q))
    coarse = np.asarray(
        xla_scores_int2(jnp.asarray(packed.T.copy()), jnp.asarray(s2), qi8, qsc)
    ).copy()
    coarse[:, src < 0] = -np.inf
    nw = n // 128
    for qi in range(len(q)):
        ret = tr[qi][np.isfinite(tv[qi])]
        assert not set(ret.tolist()) & set(range(50, 300)), "tombstone"
        # superset dominance: the threshold path's top-k fine scores are
        # elementwise >= the exact path's
        assert (tv[qi] >= ev[qi] - 1e-5).all()
        # floor = the kc-th window max (the compact path; count(>=theta)
        # stays within slack on a gaussian corpus)
        wm = coarse[qi].reshape(nw, 128).max(axis=1)
        theta = np.sort(wm)[::-1][kc - 1]
        assert abs(tf[qi] - theta) <= 1e-6
        # soundness: rows strictly above the floor all fit the slots
        assert (coarse[qi] > tf[qi] + 1e-6).sum() <= kc + _INT2_CAP_SLACK
        # returned rows all clear the floor (they were selected >= theta)
        assert (coarse[qi][ret] >= tf[qi] - 1e-6).all()


def test_int2_unknown_select_raises():
    """A typo'd select variant must raise, not silently run the exact path
    (a silent fallback would let a probe A/B exact against exact and record
    a bogus ~0 ms paired diff as a measurement)."""
    rng = np.random.default_rng(13)
    n, d = 1024, 128
    mm = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, s2 = mm._quantize2(rows)
    fine, s4 = mm._quantize4(rows)
    with pytest.raises(ValueError, match="unknown select"):
        scan_int2_coarse_fine(
            jnp.asarray(packed.T.copy()), jnp.asarray(s2),
            jnp.asarray(fine.T.copy()), jnp.asarray(s4),
            jnp.asarray(np.zeros(n, np.int32)), jnp.asarray(_unit_rows(rng, 1, d)),
            jnp.asarray(_allow_all()), 10, engine="xla", select="bisection",
        )


def test_hier_selection_matches_topk():
    """_select_topk_hier is exact: identical values (and, off ties,
    identical rows) to lax.top_k on the full score row."""
    from perceive_tpu.ops.topk import _select_topk_hier

    rng = np.random.default_rng(10)
    n, k = 512 * 600, 128  # n/128 = 2400 windows >= k
    s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    hv, hi = jax.jit(lambda x: _select_topk_hier(x, k))(s)
    tv, ti = jax.lax.top_k(s, k)
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(tv))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(ti))


@pytest.mark.parametrize("fine", ["int8", "int4"])
def test_int2_batch_routes_through_fine(fine, monkeypatch):
    """Batches wider than _INT2_MAX_Q sweep the transposed fine matrix
    (int8t kernels for the int8 companion, int4 kernels for the packed
    one) instead of materializing (Q, N) coarse scores — results stay
    exact after the f32 rerank."""
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", fine)
    rng = np.random.default_rng(11)
    n, d, k = 4096, 64, 10
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    rows = _unit_rows(rng, n, d)
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, rows)
    q = _unit_rows(rng, 16, d)  # > _INT2_MAX_Q
    hits = s.search_vectors_batch(q, k)
    exact = q @ rows.T
    for qi in range(len(q)):
        want = (np.argsort(-exact[qi])[:k] + 1).tolist()
        assert [iid for iid, _ in hits[qi]] == want


def test_int2_fine_bits_policy(monkeypatch):
    """int2_fine_bits: env override wins; auto keys on capacity * 1.25
    bytes/dim vs the budget; the matrix property reports the STORED
    companion once staged (an env flip mid-session can't desync the
    scatter path from the device bytes)."""
    from perceive_tpu.index.matrix import int2_fine_bits

    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", "int4")
    assert int2_fine_bits(512, 64) == 4
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", "int8")
    assert int2_fine_bits(10**9, 384) == 8
    monkeypatch.delenv("PERCEIVE_TPU_INT2_FINE")
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE_INT8_GB", "1")
    assert int2_fine_bits(1_000_000, 384) == 8  # 0.48 GB <= 1 GB
    assert int2_fine_bits(4_000_000, 384) == 4  # 1.92 GB > 1 GB
    monkeypatch.delenv("PERCEIVE_TPU_INT2_FINE_INT8_GB")

    # stored-dtype reporting: stage under int4, flip env, property holds
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", "int4")
    rng = np.random.default_rng(20)
    d = 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    rows = _unit_rows(rng, 512, d)
    s.upsert_embeddings(list(range(1, 513)), [0] * 512, rows)
    s.matrix.sync()
    assert s.matrix.fine_bits == 4
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", "int8")
    assert s.matrix.fine_bits == 4  # stored companion wins until restage
    # incremental scatter after the flip still lands in the stored dtype
    v2 = _unit_rows(rng, 1, d)
    s.upsert_embeddings([5], [0], v2)
    assert s.search_vector(v2[0], 1)[0][0] == 5


def test_int8t_kernels_match_xla_oracle():
    """The transposed-int8 kernels (the int2 tier's throughput companion
    path) reproduce the XLA oracle exactly: same int32 dot, same scales —
    flat kernel at small Q, slabbed at Q=256."""
    from perceive_tpu.ops.topk import (
        pallas_topk_int8t_slabbed,
        pallas_topk_int8t_unsorted,
        xla_scores_int8t,
    )

    rng = np.random.default_rng(21)
    n, d, k = 2048, 128, 8
    m = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    q8, scales = m._quantize(rows)  # row-major int8 + scales
    m8t = jnp.asarray(q8.T.copy())  # (D, N) transposed companion layout
    src = jnp.zeros((1, n), jnp.int32)
    sc2 = jnp.asarray(scales).reshape(1, n)
    allowed = jnp.asarray(_allow_all())
    for nq, kern in ((3, pallas_topk_int8t_unsorted), (256, pallas_topk_int8t_slabbed)):
        q = _unit_rows(rng, nq, d)
        qi8, qscale = quantize_queries(jnp.asarray(q))
        vals, rws = jax.jit(
            lambda a, b, c, e, f, g: kern(a, b, c, e, f, g, k, True)
        )(m8t, sc2, src, qi8, qscale, allowed)
        oracle = np.asarray(xla_scores_int8t(m8t, jnp.asarray(scales), qi8, qscale))
        ov = np.sort(oracle, axis=1)[:, ::-1][:, :k]
        got = np.sort(np.asarray(vals), axis=1)[:, ::-1]
        np.testing.assert_allclose(got, ov, rtol=1e-6)
        # rows actually correspond to their scores
        for qi in range(nq):
            np.testing.assert_allclose(
                np.asarray(vals)[qi],
                oracle[qi, np.asarray(rws)[qi]],
                rtol=1e-6,
            )


def test_int2_coarse_fine_int8_companion_candidates():
    """scan_int2_coarse_fine with fine_bits=8: oracle top-k inside the
    fine fetch, and the fine scores match an int8 rescore of the gathered
    candidates."""
    rng = np.random.default_rng(22)
    n, d, k = 8192, 128, 10  # lane-aligned: direct _quantize* calls skip padding
    mm = EmbeddingMatrix(d, dtype=INT2, capacity=n)
    rows = _unit_rows(rng, n, d)
    packed, s2 = mm._quantize2(rows)
    q8, s8 = mm._quantize(rows)
    q = _unit_rows(rng, 2, d)
    vals, rws, floor = jax.jit(
        lambda *a: scan_int2_coarse_fine(*a, 128, engine="xla", fine_bits=8)
    )(
        jnp.asarray(packed.T.copy()), jnp.asarray(s2), jnp.asarray(q8.T.copy()),
        jnp.asarray(s8), jnp.zeros(n, jnp.int32), jnp.asarray(q),
        jnp.asarray(_allow_all()),
    )
    vals, rws = np.asarray(vals), np.asarray(rws)
    exact = q @ rows.T
    oracle = np.argsort(-exact, axis=1)[:, :k]
    for qi in range(len(q)):
        cand = set(rws[qi][np.isfinite(vals[qi])].tolist())
        missing = [r for r in oracle[qi] if r not in cand]
        assert not missing, f"query {qi} lost oracle rows {missing}"
    # fine scores are int8-precision: recompute for the top hit
    qi8, qscale = quantize_queries(jnp.asarray(q))
    for qi in range(len(q)):
        top = rws[qi][0]
        want = float(
            np.asarray(qi8)[qi].astype(np.int32) @ q8[top].astype(np.int32)
        ) * s8[top] * float(np.asarray(qscale)[qi, 0])
        np.testing.assert_allclose(vals[qi][0], want, rtol=1e-5)


@pytest.mark.parametrize("fine", ["int8", "int4"])
def test_int2_prefix_sweep_exact_past_sweep_min(fine, monkeypatch):
    """The ladder prefix sweep stays exact through the COARSE-TO-FINE
    pipeline (and its batch fine-sweep route) with either companion: rows
    at the top of the high-water mark must be found."""
    from perceive_tpu.index.matrix import _SWEEP_MIN

    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", fine)
    rng = np.random.default_rng(30)
    d, n = 16, 120_000  # capacity doubles to 131072 > _SWEEP_MIN
    vecs = _unit_rows(rng, n, d)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, vecs)
    m = s.matrix
    assert m.capacity > _SWEEP_MIN
    assert n <= m.sweep_rows < m.capacity
    q = vecs[n - 3] + 0.005 * rng.standard_normal(d).astype(np.float32)
    want = (np.argsort(-(vecs @ q), kind="stable")[:5] + 1).tolist()
    assert [i for i, _ in s.search_vector(q, 5)] == want  # coarse route
    got = s.search_vectors_batch(np.stack([q, vecs[7]]), 5)  # fine batch route
    assert [i for i, _ in got[0]] == want


def test_int2_snapshot_reload_restages_companion_policy(tmp_path, monkeypatch):
    """Snapshots store the mirror, not the packed arrays — a load restages
    and re-consults the fine-companion policy, so an env flip between
    sessions (int4 -> int8) takes effect on reload and search stays
    exact."""
    import jax.numpy as jnp

    from perceive_tpu.index.matrix import EmbeddingMatrix

    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", "int4")
    rng = np.random.default_rng(31)
    n, d = 2048, 64
    rows = _unit_rows(rng, n, d)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, rows)
    s.matrix.sync()
    assert s.matrix.fine_bits == 4
    path = tmp_path / "snap.npz"
    s.matrix.save_snapshot(str(path))

    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", "int8")
    m2 = EmbeddingMatrix.load_snapshot(str(path), dtype=INT2)
    s2 = Searcher(0, 0, d, dtype=INT2, engine="xla", matrix=m2)
    assert s2.matrix.fine_bits == 8  # policy re-consulted at restage
    q = rows[37]
    want = (np.argsort(-(rows @ q))[:5] + 1).tolist()
    assert [i for i, _ in s2.search_vector(q, 5)] == want
    vectors, _, _ = s2.matrix.device_view()
    assert vectors[1].dtype == jnp.int8


# -- round 4: epilogue-fused "tiletop" selection


def _tiletop_fixture(rng, n, d):
    d4 = d // 4
    packed = rng.integers(0, 256, (d4, n), dtype=np.uint8)
    scales = rng.uniform(0.005, 0.02, n).astype(np.float32)
    src = np.zeros(n, np.int32)
    q = rng.standard_normal((2, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p4 = rng.integers(0, 256, (d // 2, n), dtype=np.uint8)
    s4 = rng.uniform(0.005, 0.02, n).astype(np.float32)
    return packed, scales, src, q, p4, s4


def test_tiletop_kernel_matches_per_bin_oracle():
    """Every (val, row) the epilogue writes must be a true masked score,
    and per (tile, stride-128 lane bin) the kept depth-p values must be
    that bin's true top-p."""
    from perceive_tpu.ops.topk import (
        _pick_tile_int2,
        pallas_int2_scores,
        pallas_int2_scores_tiletop,
    )

    rng = np.random.default_rng(3)
    n, d = 98_304, 128
    packed, scales, src, q, _, _ = _tiletop_fixture(rng, n, d)
    allowed = _allow_all()
    qi8, qscale = quantize_queries(jnp.asarray(q))
    args = (
        jnp.asarray(packed), jnp.asarray(scales).reshape(1, n),
        jnp.asarray(src).reshape(1, n), qi8, qscale, jnp.asarray(allowed),
        True, n,
    )
    full = np.asarray(pallas_int2_scores(*args))
    tv, tr = map(np.asarray, pallas_int2_scores_tiletop(*args, kc=128))
    tile = _pick_tile_int2(n, 2, d // 4)
    t_cnt = n // tile
    m = tv.shape[1] // t_cnt
    p = m // 128
    for qi in range(2):
        np.testing.assert_allclose(full[qi][tr[qi]], tv[qi], atol=1e-5)
        tvq = tv[qi].reshape(t_cnt, p, 128)
        for t in range(t_cnt):
            bins = full[qi, t * tile : (t + 1) * tile].reshape(-1, 128)
            want = -np.sort(-bins, axis=0)[:p]  # (p, 128) per-bin top-p
            got = -np.sort(-tvq[t], axis=0)
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_tiletop_pipeline_matches_exact_select():
    """Full coarse-to-fine pipeline with select='tiletop' vs 'exact': the
    binned selection is statistical (a candidate with >= 2 better rows in
    its stride-128 bin drops, ~(R*96/n)^2/2 per rank-R row), so top-10
    agreement is near-total but not bitwise — require >= 9/10 per query
    on this seeded corpus and exact values wherever rows agree."""
    rng = np.random.default_rng(4)
    n, d = 98_304, 128
    packed, scales, src, q, p4, s4 = _tiletop_fixture(rng, n, d)
    allowed = _allow_all()
    args = (
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(p4),
        jnp.asarray(s4), jnp.asarray(src), jnp.asarray(q),
        jnp.asarray(allowed),
    )
    ve, re_, fe = scan_int2_coarse_fine(
        *args, 64, k_coarse=128, engine="pallas", interpret=True,
        select="exact",
    )
    vt, rt, ft = scan_int2_coarse_fine(
        *args, 64, k_coarse=128, engine="pallas", interpret=True,
        select="tiletop",
    )
    ve, re_, vt, rt = map(np.asarray, (ve, re_, vt, rt))
    for qi in range(2):
        a, b = re_[qi][:10].tolist(), rt[qi][:10].tolist()
        assert len(set(a) & set(b)) >= 9, (a, b)
        both = [(i, b.index(r)) for i, r in enumerate(a) if r in b]
        for ia, ib in both:
            np.testing.assert_allclose(ve[qi][ia], vt[qi][ib], rtol=1e-6)
    # statistical floor exists
    assert np.isfinite(np.asarray(ft)).all()


def test_tiletop_guards():
    """xla engine and too-shallow geometries must refuse loudly; the
    viability predicate agrees with the constructor."""
    from perceive_tpu.ops.topk import tiletop_viable

    rng = np.random.default_rng(5)
    n, d = 4096, 128
    packed, scales, src, q, p4, s4 = _tiletop_fixture(rng, n, d)
    allowed = _allow_all()
    args = (
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(p4),
        jnp.asarray(s4), jnp.asarray(src), jnp.asarray(q),
        jnp.asarray(allowed),
    )
    with pytest.raises(ValueError, match="pallas engine"):
        scan_int2_coarse_fine(
            *args, 64, k_coarse=512, engine="xla", select="tiletop"
        )
    # single-tile corpus at kc=512 needs a 1024-deep epilogue: refused
    assert not tiletop_viable(n, 2, d // 4, 512)
    with pytest.raises(ValueError, match="tiletop"):
        scan_int2_coarse_fine(
            *args, 64, k_coarse=512, engine="pallas", interpret=True,
            select="tiletop",
        )
    assert tiletop_viable(98_304, 2, d // 4, 128)
