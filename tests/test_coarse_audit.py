"""Int2 coarse self-audit (round 3): the coarse pass may only serve
queries when a measurement ON THE ACTUAL CORPUS says it is trustworthy.

Why: on corpora whose score ties are denser than the int2 grid can rank
(topical clusters with within-cluster exact spread below the grid
half-step), quantization deletes within-cluster rank order — the coarse
pass keeps a near-random kc-subset of the tie bulk (candidate-recall@10
0.817 measured at 10M, benchmarks/recall_int2.py clustered2) and the
statistical floor cannot see it.  No margin separates that regime from
the easy one, so the searcher samples stored vectors (worst-case
queries: they sit mid-cluster by construction), compares the coarse
pipeline against its own escalation target (the int4 fine sweep,
4x deeper), and demotes the coarse pass when top-k overlap flunks
(searcher.audit_coarse, BENCH_NOTES round-3).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.index import searcher as searcher_mod
from perceive_tpu.index.matrix import INT2, INT4
from perceive_tpu.index.searcher import Searcher


def _unit(rng, n, d):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _clustered_rows(rng, n_cluster, n_bg, d, spread):
    """One near-duplicate cluster of ``n_cluster`` rows (within-cluster
    per-dim offset ``spread`` in units of the row rms) + ``n_bg`` random
    rows.  Cluster rows are int2-indistinguishable when spread is well
    under the grid half-step (0.5 rms)."""
    center = _unit(rng, 1, d)[0]
    noise = _unit(rng, n_cluster, d)
    cluster = center[None, :] + spread * noise
    cluster /= np.linalg.norm(cluster, axis=1, keepdims=True)
    return np.concatenate([cluster, _unit(rng, n_bg, d)]).astype(np.float32)


def test_audit_trusts_isotropic_corpus():
    rng = np.random.default_rng(0)
    n, d = 8192, 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, d))
    # upsert_embeddings audited automatically (never-audited -> stale)
    assert s.coarse_audit is not None
    assert s.coarse_audit["trusted"] and s.matrix.coarse_trusted
    assert s.coarse_audit["overlap"] >= 0.95
    assert s.coarse_audit["queries"] > 0


@pytest.mark.parametrize("fine", ["int4", "int8"])
def test_audit_demotes_on_dense_tie_corpus_and_fine_path_serves(fine, monkeypatch):
    """A 20k-row near-duplicate cluster (> kc = 4096) with spread ~0.2 rms:
    the coarse pass can only keep ~4096/20000 of the tie bulk, the audit
    must flunk it, and subsequent queries must return exactly what the
    same-width tier returns on the same rows (the demoted path IS that
    sweep — byte-identical int4 fine matrix, or the int8 companion with
    the row-major int8 tier's levels and scales)."""
    monkeypatch.setenv("PERCEIVE_TPU_INT2_FINE", fine)
    rng = np.random.default_rng(1)
    d = 64
    rows = _clustered_rows(rng, n_cluster=20_000, n_bg=4_576, d=d, spread=0.2)
    ids = list(range(1, len(rows) + 1))
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(ids, [0] * len(rows), rows)
    assert s.coarse_audit is not None and not s.coarse_audit["trusted"]
    assert not s.matrix.coarse_trusted
    assert s.coarse_audit["overlap"] < 0.95
    # demoted queries == the same-width tier's results on identical rows
    ref = Searcher(0, 0, d, dtype=INT4 if fine == "int4" else jnp.int8, engine="xla")
    ref.upsert_embeddings(ids, [0] * len(rows), rows)
    q = rows[37] + 0.01 * _unit(rng, 1, d)[0]
    q /= np.linalg.norm(q)
    got = s.search_vector(q, 10)
    want = ref.search_vector(q, 10)
    assert [i for i, _ in got] == [i for i, _ in want]
    np.testing.assert_allclose(
        [v for _, v in got], [v for _, v in want], rtol=1e-6
    )


def test_audit_reruns_on_shrink(monkeypatch):
    """Removals can strip the easy background and leave a pure dense-tie
    corpus — a >= 1.25x SHRINK must re-audit (round-3 review: the
    growth-only check went stale exactly when composition changed)."""
    rng = np.random.default_rng(7)
    d = 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    calls = {"n": 0}
    orig = Searcher.audit_coarse

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Searcher, "audit_coarse", counting)
    s.upsert_embeddings(list(range(1, 5001)), [0] * 5000, _unit(rng, 5000, d))
    assert calls["n"] == 1
    # tombstone 10%: 4500 * 1.25 > 5000 -> no re-audit yet
    s.remove_items(list(range(1, 501)))
    assert calls["n"] == 1
    # down to 3500 live: 3500 * 1.25 <= 5000 -> re-audit
    s.remove_items(list(range(501, 1501)))
    assert calls["n"] == 2
    assert s.coarse_audit["rows"] == len(s.matrix)


def test_single_query_gate_demotes_when_mean_passes(monkeypatch):
    """The per-query minimum gate must demote even when the mean gate is
    satisfied: drop the mean gate to 0.1 on a dense-tie corpus (measured
    mean ~0.5) and the min gate (0.5, hit by the worst samples) must still
    flunk the coarse pass."""
    monkeypatch.setenv("PERCEIVE_TPU_COARSE_AUDIT_MIN", "0.1")
    rng = np.random.default_rng(8)
    d = 64
    rows = _clustered_rows(rng, n_cluster=20_000, n_bg=4_576, d=d, spread=0.2)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, len(rows) + 1)), [0] * len(rows), rows)
    a = s.coarse_audit
    assert a["overlap"] >= 0.1  # mean gate passes...
    assert a["min_overlap"] < 0.5  # ...but a sampled query flunks
    assert not a["trusted"] and not s.matrix.coarse_trusted


def test_trust_flip_bumps_mutation_gen():
    """A demotion changes what a sweep returns; the executor's text-result
    cache keys on mutation_gen, so the flip must bump it (round-3 review:
    stale coarse-pass results would keep serving from cache)."""
    rng = np.random.default_rng(9)
    d = 64
    rows = _clustered_rows(rng, n_cluster=20_000, n_bg=4_576, d=d, spread=0.2)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.matrix.upsert(
        list(range(1, len(rows) + 1)), [0] * len(rows), rows
    )
    gen0 = s.matrix.mutation_gen
    s.audit_coarse()
    assert not s.matrix.coarse_trusted
    assert s.matrix.mutation_gen > gen0
    # no flip on a repeat audit with the same verdict -> no gratuitous bump
    gen1 = s.matrix.mutation_gen
    s.audit_coarse()
    assert s.matrix.mutation_gen == gen1


def test_leaving_int2_clears_stale_verdict(monkeypatch):
    """Retier out of int2 must drop the recorded audit dict — stats//status
    would otherwise show a demotion banner for a tier with no coarse pass
    (round-3 review)."""
    rng = np.random.default_rng(10)
    d = 64
    tiers = {"n": INT2}
    monkeypatch.setattr(
        "perceive_tpu.index.matrix.auto_matrix_dtype", lambda n, padded_dim=384: tiers["n"]
    )
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.auto_retier = True
    s.upsert_embeddings(list(range(1, 2001)), [0] * 2000, _unit(rng, 2000, d))
    assert s.coarse_audit is not None
    tiers["n"] = jnp.int8  # next upsert auto-retiers out of int2
    s.upsert_embeddings(list(range(2001, 2101)), [0] * 100, _unit(rng, 100, d))
    assert not s.matrix.packed2
    assert s.coarse_audit is None


def test_audit_reruns_on_growth_only(monkeypatch):
    rng = np.random.default_rng(2)
    d = 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    calls = {"n": 0}
    orig = Searcher.audit_coarse

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Searcher, "audit_coarse", counting)
    s.upsert_embeddings(list(range(1, 4001)), [0] * 4000, _unit(rng, 4000, d))
    assert calls["n"] == 1
    # +5% growth: under the 1.25x re-audit threshold -> no re-run
    s.upsert_embeddings(list(range(4001, 4201)), [0] * 200, _unit(rng, 200, d))
    assert calls["n"] == 1
    # past 1.25x total -> re-audit
    s.upsert_embeddings(
        list(range(4201, 5501)), [0] * 1300, _unit(rng, 1300, d)
    )
    assert calls["n"] == 2
    assert s.coarse_audit["rows"] == len(s.matrix)


def test_audit_disabled_by_env(monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_COARSE_AUDIT", "0")
    rng = np.random.default_rng(3)
    d = 64
    rows = _clustered_rows(rng, n_cluster=8_000, n_bg=192, d=d, spread=0.2)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, len(rows) + 1)), [0] * len(rows), rows)
    # disabled: trusted unconditionally, no measurement recorded
    assert s.matrix.coarse_trusted
    assert s.coarse_audit is None


def test_retier_into_int2_forces_fresh_audit(monkeypatch):
    """auto_retier entering the int2 tier must re-audit immediately — the
    previous tier's audit (or none) says nothing about the new one."""
    rng = np.random.default_rng(4)
    d = 64
    monkeypatch.setattr(
        "perceive_tpu.index.matrix.auto_matrix_dtype",
        lambda n, padded_dim=384: INT2 if n > 1000 else jnp.int8,
    )
    s = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    s.auto_retier = True
    calls = {"n": 0}
    orig = Searcher.audit_coarse

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Searcher, "audit_coarse", counting)
    s.upsert_embeddings(list(range(1, 901)), [0] * 900, _unit(rng, 900, d))
    assert calls["n"] == 0 and not s.matrix.packed2  # int8: no audit
    s.upsert_embeddings(list(range(901, 1201)), [0] * 300, _unit(rng, 300, d))
    assert s.matrix.packed2 and calls["n"] == 1
    assert s.matrix.coarse_trusted  # isotropic rows: audit passes


def test_demotion_recompiles_fused_program():
    """The fused text program bakes use_coarse at build time; a trust flip
    must produce a DIFFERENT compiled callable (cache key includes
    coarse_trusted), or a demoted matrix would keep serving coarse sweeps
    through the stale program."""
    from perceive_tpu.models import (
        EncoderArch,
        HeadConfig,
        Model,
        TextTokenizer,
        tiny_test_vocab,
    )

    words = "alpha beta gamma delta".split()
    vocab = tiny_test_vocab(words)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=16)
    arch = EncoderArch(
        vocab_size=len(vocab), hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=16,
    )
    model = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=0)
    model.model_id = 0
    rng = np.random.default_rng(5)
    s = Searcher(0, 0, model.dim, dtype=INT2, engine="xla")
    s.upsert_embeddings([1, 2, 3], [0, 0, 0], _unit(rng, 3, model.dim))
    fn_trusted = s._fused_callable(model, None)
    s.matrix.coarse_trusted = False
    fn_demoted = s._fused_callable(model, None)
    assert fn_trusted is not fn_demoted
    # and results through the demoted program still match search()
    texts_hits = s.search_fused(model, "alpha beta", 2)
    want = s.search(model, "alpha beta", 2)
    assert [i for i, _ in texts_hits] == [i for i, _ in want]


def test_fused_deep_fetch_routes_to_fine_companion(monkeypatch):
    """search_fused must apply the SAME int2 depth rule as _scan (single
    home: Searcher._coarse_pays, review r3): a deep first fetch
    (2*kb > coarse set) uses the fine-companion fused variant, never the
    coarse pipeline at a depth where its hierarchical select stops paying."""
    from tests.test_parallel import _tiny_model

    monkeypatch.setenv("PERCEIVE_TPU_COARSE_AUDIT", "0")  # isolate routing
    model, words = _tiny_model()
    rng = np.random.default_rng(21)
    n = 4608
    s = Searcher(0, 0, model.dim, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, model.dim))
    assert s.matrix.coarse_trusted
    k = 1024
    kb = searcher_mod._k_bucket(s._first_fetch(k), s.matrix.sweep_rows)
    assert not s._coarse_pays(kb), "test premise: this fetch must be deep"
    hits = s.search_fused(model, "alpha beta", k)
    routes = {key[:3] for key in s._fused_cache}
    assert (s.engine, 2, False) in routes, "deep fused fetch kept the coarse route"
    assert (s.engine, 2, True) not in routes
    want = s.search(model, "alpha beta", k)
    assert [i for i, _ in hits] == [i for i, _ in want]
    # a shallow query still takes (and caches) the coarse route
    shallow = s.search_fused(model, "alpha beta", 2)
    assert (s.engine, 2, True) in {key[:3] for key in s._fused_cache}
    assert [i for i, _ in shallow] == [i for i, _ in s.search(model, "alpha beta", 2)]


def test_audit_select_gate_flips_on_rank_displacement(monkeypatch):
    """Round 4: the audit decides the coarse SELECT variant from measured
    coarse-rank displacement — small ranks keep the PartialReduce select,
    dense-tie-inflated ranks fall back to the exact hierarchical select
    (and the flip bumps mutation_gen so cached results invalidate)."""
    rng = np.random.default_rng(5)
    n, d = 8192, 64
    # bins < n so the collision rate (1/bins - 1/n) is real compression
    bins = 2048

    monkeypatch.setattr(Searcher, "_approx_bins", lambda self, fetch=0: bins)
    ranks = {"value": 2.0}
    monkeypatch.setattr(
        Searcher,
        "_audit_rank_counts",
        # batched interface (round 4): (B, D) queries x (B, k) rows ->
        # (B, k) counts; padded slots (row < 0) must count 0
        lambda self, q1, rows: np.where(
            np.asarray(rows) >= 0, ranks["value"], 0
        ).astype(np.float64),
    )

    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, d))
    assert s.coarse_audit["select"] == "approx"
    assert s.matrix.coarse_select == "approx"
    assert s.coarse_audit["approx_risk"] < 1e-3

    # dense-tie regime: mean reference rank ~ thousands -> risk over budget
    ranks["value"] = 3000.0  # risk ~ 1.1
    gen0 = s.matrix.mutation_gen
    s.audit_coarse()
    assert s.coarse_audit["select"] == "exact"
    assert s.matrix.coarse_select == "exact"
    assert s.matrix.mutation_gen > gen0

    # drift back to an easy corpus: re-audit re-enables approx
    ranks["value"] = 2.0
    s.audit_coarse()
    assert s.matrix.coarse_select == "approx"


def test_audit_select_fail_safe_without_risk_estimate(monkeypatch):
    """Risk unmeasurable (bin estimate failed, returns 0) -> the exact
    select takes over: slower, never lossier.  (None instead means the
    approx branch is disengaged at this corpus size - harmless.)"""
    rng = np.random.default_rng(6)
    n, d = 8192, 64
    monkeypatch.setattr(Searcher, "_approx_bins", lambda self, fetch=0: 0)
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, d))
    assert s.matrix.coarse_select == "exact"


# -- round 4: audit scaling, stratification, per-source churn (VERDICT r3 #3)


def test_audit_sample_count_scales_with_corpus(monkeypatch):
    """Unset, the sample count scales k * log2(rows) clamped to [12, 384];
    the env var pins it absolutely (the existing tests rely on that)."""
    monkeypatch.delenv("PERCEIVE_TPU_COARSE_AUDIT", raising=False)
    f = searcher_mod._coarse_audit_queries
    assert f(0) == 12
    assert f(100) == 67  # 10 * log2(101)
    assert f(1_700_000) == 207
    assert f(10_000_000) == 233
    assert f(2**60) == 384  # cap
    assert f(2, k=1) == 12  # floor
    monkeypatch.setenv("PERCEIVE_TPU_COARSE_AUDIT", "7")
    assert f(10_000_000) == 7


def test_stratified_floor_samples_every_big_source():
    """Proportional allocation alone gives a 1.2%-mass source an expected
    0.3 samples at n=24; the floor (source >= kc/4 live rows) must
    guarantee it at least one — a small near-duplicate source is the
    common dense-tie producer and must be observed EVERY audit."""
    rng = np.random.default_rng(3)
    n_big, n_small, kc = 100_000, 1_200, 4096
    live_src = np.concatenate(
        [np.zeros(n_big, np.int32), np.full(n_small, 5, np.int32)]
    )
    live = np.arange(n_big + n_small)
    src_ids = np.array([0, 5])
    src_counts = np.array([n_big, n_small])
    sample = Searcher._stratified_sample(
        rng, live, live_src, src_ids, src_counts, 24, kc
    )
    assert (live_src[sample] == 5).sum() >= 1
    assert (live_src[sample] == 0).sum() >= 20  # bulk still proportional
    assert len(np.unique(sample)) == len(sample)  # without replacement


def test_src_churn_triggers_reaudit_at_stable_total(monkeypatch):
    """A single source turning over must re-audit even while the TOTAL row
    count stays inside the growth band (VERDICT r3: per-source shifts at
    stable totals went unaudited).  Churn accumulates across calls and
    resets on audit."""
    rng = np.random.default_rng(9)
    d = 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    calls = {"n": 0}
    orig = Searcher.audit_coarse

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Searcher, "audit_coarse", counting)
    s.upsert_embeddings(list(range(1, 2001)), [0] * 2000, _unit(rng, 2000, d))
    s.upsert_embeddings(
        list(range(2001, 4001)), [1] * 2000, _unit(rng, 2000, d)
    )
    base = calls["n"]  # initial + growth audits
    # source 1 churn 300 < max(256, 0.25 * 2000) -> no re-audit yet
    s.remove_items(list(range(2001, 2301)))
    assert calls["n"] == base
    # +300 more: accumulated churn 600 >= 500 while the total moved only
    # 4000 -> 3400 (inside the 1.25x growth band) -> re-audit fires
    s.remove_items(list(range(2301, 2601)))
    assert calls["n"] == base + 1
    # audit reset the churn ledger: another small removal doesn't re-fire
    s.remove_items(list(range(2601, 2701)))
    assert calls["n"] == base + 1


def test_adversarial_half_percent_hidden_cluster(monkeypatch):
    """VERDICT r3 #3 'done' criterion: a 0.5%-mass, >8k-row near-duplicate
    cluster must be demoted with >= 95% probability across audits.

    Corpus: 8,500 near-duplicate rows (spread 0.05 rms — int2-
    indistinguishable) in their own source + 1.6915M isotropic background
    rows, total 1.7M.  Two detection layers:

    * stratification guarantees >= 1 sample from the 8.5k-row source every
      audit (floor: any source >= kc/4 = 1024 live rows), and a sampled
      mid-cluster query retains each true top-10 row w.p. ~kc/8500 ~ 0.48
      through the 4096-row coarse fetch, so its overlap ~ Binomial(10, ~.5)
      flunks the 0.75 single-query gate w.p. ~0.96 PER AUDIT — the seeded
      sampler makes this run deterministic, and we allow one re-audit
      (compound ~0.998) for robustness to gate-marginal draws;
    * had the cluster hidden inside the big source instead, the scaled
      sample count n = 207 at 1.7M rows gives per-audit hit probability
      1-(1-0.005)^207 = 0.646, compounding past 0.95 within 4 fresh-seed
      re-audits — asserted analytically below (running 4 full-corpus
      audits is CPU-prohibitive; the stratified layer above exercises the
      real pipeline end-to-end).

    The sample count is env-pinned to 64 for cost only — detection here
    rides the stratification floor, not n.
    """
    monkeypatch.setenv("PERCEIVE_TPU_COARSE_AUDIT", "64")
    rng = np.random.default_rng(11)
    d = 64
    n_cluster, n_bg = 8_500, 1_691_500
    center = _unit(rng, 1, d)[0]
    cluster = center[None, :] + 0.05 * _unit(rng, n_cluster, d)
    cluster /= np.linalg.norm(cluster, axis=1, keepdims=True)
    rows = np.concatenate([cluster, _unit(rng, n_bg, d)]).astype(np.float32)
    srcs = [7] * n_cluster + [0] * n_bg

    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(
        list(range(1, len(rows) + 1)), srcs, rows, maintenance=False
    )
    s.audit_coarse()
    if s.coarse_audit["trusted"]:  # gate-marginal draw: one re-audit
        s.audit_coarse()
    assert not s.coarse_audit["trusted"]
    assert not s.matrix.coarse_trusted
    assert s.coarse_audit["strata"] == 2
    assert s.coarse_audit["min_overlap"] < Searcher._COARSE_AUDIT_MIN_SINGLE

    # the hidden-cluster compounding bound, from the ACTUAL auto-scaled
    # sample count at this corpus size (the env pin above does not apply
    # in production):
    monkeypatch.delenv("PERCEIVE_TPU_COARSE_AUDIT")
    n_auto = searcher_mod._coarse_audit_queries(len(rows), 10)
    p_hit = 1.0 - (1.0 - n_cluster / len(rows)) ** n_auto
    p_flunk_given_hit = 0.95  # Binomial(10, .48) <= 7 is ~0.958
    p_audit = p_hit * p_flunk_given_hit
    assert 1.0 - (1.0 - p_audit) ** 4 >= 0.95


# -- round 4: adaptive coarse fetch (VERDICT r3 #2c)


def test_adaptive_fetch_shallows_on_easy_corpus(monkeypatch):
    """Isotropic corpus, compressing coarse pass (kc < n): the measured
    displacement tail is tiny, so the audit shallows the fetch to the
    1024 ladder entry (measured 2.15 -> 1.66 ms at 10M;
    probe_int2_approx6) and results stay exact vs the same-rows int8
    reference (escalation floors cover the shallower depth)."""
    monkeypatch.delenv("PERCEIVE_TPU_COARSE_FETCH", raising=False)
    rng = np.random.default_rng(21)
    n, d = 8192, 64
    rows = _unit(rng, n, d)
    ids = list(range(1, n + 1))
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(ids, [0] * n, rows)
    assert s.coarse_audit["trusted"]
    assert s.coarse_audit["fetch"] == 1024
    assert s.matrix.coarse_fetch == 1024
    # exactness is preserved through the shallower fetch + rerank
    ref = Searcher(0, 0, d, dtype=jnp.int8, engine="xla")
    ref.upsert_embeddings(ids, [0] * n, rows)
    for qi in (3, 1000, 7000):
        q = rows[qi] + 0.01 * _unit(rng, 1, d)[0]
        q /= np.linalg.norm(q)
        got = [i for i, _ in s.search_vector(q, 10)]
        want = [i for i, _ in ref.search_vector(q, 10)]
        assert got == want


def test_adaptive_fetch_stays_default_on_wide_displacement(monkeypatch):
    """Displacement tail past the margin must keep the default fetch:
    stubbed per-query ranks of 1200 need 2x1200 = 2400 > every ladder
    entry."""
    monkeypatch.delenv("PERCEIVE_TPU_COARSE_FETCH", raising=False)
    rng = np.random.default_rng(22)
    n, d = 8192, 64
    monkeypatch.setattr(
        Searcher,
        "_audit_rank_counts",
        lambda self, q1, rows: np.where(np.asarray(rows) >= 0, 1200.0, 0),
    )
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, d))
    assert s.coarse_audit["fetch"] == 0
    assert s.matrix.coarse_fetch == 0


def test_adaptive_fetch_env_pin(monkeypatch):
    monkeypatch.setenv("PERCEIVE_TPU_COARSE_FETCH", "2048")
    rng = np.random.default_rng(23)
    n, d = 8192, 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, d))
    assert s.matrix.coarse_fetch == 2048


def test_fetch_change_bumps_mutation_gen(monkeypatch):
    """A fetch change alone (same select verdict) must invalidate cached
    programs/results exactly like a select flip."""
    monkeypatch.delenv("PERCEIVE_TPU_COARSE_FETCH", raising=False)
    rng = np.random.default_rng(24)
    n, d = 8192, 64
    s = Searcher(0, 0, d, dtype=INT2, engine="xla")
    s.upsert_embeddings(list(range(1, n + 1)), [0] * n, _unit(rng, n, d))
    assert s.matrix.coarse_fetch == 1024
    gen0 = s.matrix.mutation_gen
    monkeypatch.setenv("PERCEIVE_TPU_COARSE_FETCH", "0")
    s.audit_coarse()
    assert s.matrix.coarse_fetch == 0
    assert s.matrix.mutation_gen > gen0
