"""Headline benchmark: exact top-k query throughput over the HBM-resident
bf16 corpus (BASELINE.md config 1/5 — flat cosine top-k, fused Pallas scan)
plus the ingest-side embed throughput (BASELINE.md config 2).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} where
vs_baseline is measured QPS / the 10k-QPS driver target and
embed_vs_baseline is embed docs/s / the 5k-docs/s target (BASELINE.json;
the reference publishes no numbers, see BASELINE.md).

`bench.py --ingest` instead runs the END-TO-END ingest pipeline (synthetic
10k-doc tree -> scan -> match -> read -> embed -> SQLite) and prints its own
JSON line with per-stage attribution (VERDICT r1 #5).

Measurement notes:
  * the serving tunnel costs ~45 ms per dispatch ROUND TRIP (a trivial
    multiply measures the same wall as a 7.7 GB sweep), so single-call
    walls are meaningless.  Kernel times here use the in-jit repeat method:
    run the kernel R times inside ONE jit (fori_loop over DISTINCT query
    slices, outputs accumulated so nothing elides) and take
    marginal = (wall_R - wall_1) / (R - 1).  wall_1 is also reported as
    tunnel_roundtrip_ms for transparency;
  * every timed call still uses DISTINCT inputs — the tunnel memoizes
    back-to-back identical (program, args) executions;
  * corpus rows are generated directly in bf16 on device (10M x 384 =
    7.7 GB; no f32 staging) and row-padded to the kernel's 4096 tile;
  * the headline QPS uses batch 2048 through the query-slabbed kernel (the
    serving path coalesces concurrent queries; index/executor.py);
  * the int2/int4 single-query p50s are measured INTERLEAVED (both
    pipelines compiled first, A/B/A/B alternating rounds, median per tier)
    — sequential per-tier runs carry ~0.6 ms of chip weather, enough to
    rank the tiers wrong (BENCH_NOTES round-3 probe_tier_ab).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import ALLOW_ALL, _INT2_APPROX_RT

K = 10
QUERY_BATCH = 2048
TIMED_ITERS = 5
EMBED_BATCH, EMBED_SEQ = 256, 128

# Device-weather calibration (VERDICT r4 #2).  Healthy-session capability
# figures for the two health probes, measured on the bench chip
# 2026-08-20 (round 5, tunnel RT 32-43 ms session; see BENCH_NOTES
# "round-5 health calibration").  A run whose probe exceeds CALIBRATION *
# DEGRADED_FACTOR is stamped degraded: the round-4 artifact carried 23-75x
# swings on secondary walls with no flag, and a reader concluded bf16
# regressed 23x when the tunnel was simply sick that day.
_HEALTH_CALIBRATION = {
    # healthy-session tunnel RT measured 32-45 ms across rounds 3-5
    "tunnel_roundtrip_ms": 45.0,
    # 524k x 384 bf16 = 0.40 GB at the bf16 sweep's measured ~770 GB/s
    # (BENCH_r03 p50_bf16 10.4 ms over 7.7 GB) -> ~0.52 ms healthy
    "ref_sweep_524k_ms": 0.55,
}
_DEGRADED_FACTOR = 2.5


def _with_timeout(fn, seconds: float, default=None, label: str = "phase"):
    """Run ``fn()`` on a daemon worker thread, give up after ``seconds``.

    This session's remote compile service took 25-40 min for single fresh
    programs and once broke mid-compile (BENCH_NOTES round-5 operational
    notes).  A wedged phase must cost its own keys (None), never the whole
    artifact: the driver's timeout killing the process would leave NO
    BENCH JSON at all.  The worker thread keeps blocking in the native
    compile call after we give up — main() finishes, prints the JSON, and
    exits via os._exit so the hung thread can't block interpreter
    teardown."""
    import threading

    out: list = [default]

    def run():
        try:
            out[0] = fn()
        except Exception as e:  # noqa: BLE001 — phase failure is phase-local
            print(f"# {label} failed ({e})", flush=True)

    t = threading.Thread(target=run, daemon=True, name=f"bench-{label}")
    t.start()
    t.join(seconds)
    if t.is_alive():
        print(f"# {label} timed out after {seconds:.0f}s (likely a wedged "
              "remote compile); continuing without it", flush=True)
        return default
    return out[0]


_PHASE_TIMEOUT_S = float(os.environ.get("PERCEIVE_TPU_BENCH_PHASE_TIMEOUT", "2700"))


def measure_health(tag: str, *, ref_matrix=None) -> dict:
    """Cheap device-health probe: tunnel round trip (distinct tiny arrays —
    the tunnel memoizes identical calls) + a fixed 524k x 384 bf16
    single-query sweep via the same in-jit marginal as every bench metric.
    Returns {"tag", "tunnel_roundtrip_ms", "ref_sweep_524k_ms",
    "degraded"}; callers re-run it between heavy phases so each key group
    in the artifact carries the device weather it was measured under."""
    rts = []
    for i in range(5):
        x = np.full((64, 64), float(i), np.float32)
        t0 = time.perf_counter()
        np.asarray(jax.device_put(x) + 1.0)
        rts.append(time.perf_counter() - t0)
    rt_ms = float(np.median(rts)) * 1e3

    n_ref, d = 524_288, 384
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))
    own = ref_matrix is None
    try:
        m = (
            jax.block_until_ready(
                jax.random.normal(jax.random.PRNGKey(3), (n_ref, d), jnp.bfloat16)
            )
            if own
            else ref_matrix
        )
        src = jax.block_until_ready(jnp.zeros((n_ref,), jnp.int32))
        sweep_s, _ = _marginal_sweep_s(m, src, allowed, 1, 16, reps=(1, 9))
        sweep_ms = sweep_s * 1e3
        if own:
            del m
    except Exception as e:  # noqa: BLE001 — health info must not kill the run
        print(f"# health ref sweep unavailable ({e})", flush=True)
        sweep_ms = None
    degraded = rt_ms > _HEALTH_CALIBRATION["tunnel_roundtrip_ms"] * _DEGRADED_FACTOR or (
        sweep_ms is not None
        and sweep_ms > _HEALTH_CALIBRATION["ref_sweep_524k_ms"] * _DEGRADED_FACTOR
    )
    out = {
        "tag": tag,
        "tunnel_roundtrip_ms": round(rt_ms, 1),
        "ref_sweep_524k_ms": sweep_ms and round(sweep_ms, 3),
        "degraded": bool(degraded),
    }
    print(f"# health[{tag}]: {out}", flush=True)
    return out


def _marginal_sweep_s(matrix, source_ids, allowed, batch: int, k: int, *, reps, iters=3):
    """True per-sweep seconds via the in-jit repeat method (module
    docstring); returns (marginal_s, wall_1_s).  Falls back to the XLA
    engine when the Pallas kernel is unavailable."""
    from perceive_tpu.index.searcher import _scan_topk_xla_impl
    from perceive_tpu.ops.topk import QUERY_SLAB, pallas_topk_slabbed, pallas_topk_unsorted

    n, d = matrix.shape
    src2d = jax.block_until_ready(source_ids.reshape(1, n))
    use_slab = batch >= 2 * QUERY_SLAB and batch % QUERY_SLAB == 0

    # the matrix is passed as a jit ARGUMENT everywhere — closing over it
    # would bake a 7.7 GB captured constant into every executable
    def one_scan_pallas(q, m, s2, s1):
        qc = q.astype(m.dtype)
        if use_slab:
            return pallas_topk_slabbed(m, s2, qc, allowed, k, False)
        return pallas_topk_unsorted(m, s2, qc, allowed, k, False)

    def one_scan_xla(q, m, s2, s1):
        return _scan_topk_xla_impl(m, s1, q, allowed, k)

    def queries(seed: int, r: int):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, batch, d), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def make(r, one_scan):
        def f(qs, m, s2, s1):
            def it(i, acc):
                v, rows = one_scan(qs[i], m, s2, s1)
                return acc + jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return jax.jit(f)

    one_scan = one_scan_pallas
    try:
        np.asarray(make(1, one_scan)(queries(0, 1), matrix, src2d, source_ids))
    except Exception as e:  # noqa: BLE001 — never fail the bench run outright
        print(f"# pallas kernel unavailable ({e}); falling back to XLA engine", flush=True)
        one_scan = one_scan_xla

    walls = {}
    for r in reps:
        fn = make(r, one_scan)
        np.asarray(fn(queries(1, r), matrix, src2d, source_ids))  # compile + warm
        ts = []
        for i in range(iters):
            qs = queries(100 + 7 * i + r, r)
            t0 = time.perf_counter()
            np.asarray(fn(qs, matrix, src2d, source_ids))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    marginal = (walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0])
    return max(marginal, 1e-9), walls[reps[0]]


def _injit_marginal(body, arrays, *, batch, d, reps, seed_base, iters=3):
    """Shared in-jit repeat-marginal harness (module docstring): jit a
    fori_loop running ``body(q_i, *arrays)`` r times over DISTINCT query
    slices, take marginal = (wall_R - wall_1)/(R - 1).  ONE implementation
    so the timing method can never diverge between the tier measurements
    being compared against each other (round-3 review)."""

    def queries(seed, r):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, batch, d), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def make(r):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return jax.jit(f)

    walls = {}
    for r in reps:
        fn = make(r)
        np.asarray(fn(queries(1, r), *arrays))  # compile + warm
        ts = []
        for i in range(iters):
            qs = queries(seed_base + 7 * i + r, r)
            t0 = time.perf_counter()
            np.asarray(fn(qs, *arrays))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    return max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)


def _marginal_int8_qps(n: int, d: int, allowed, *, iters=3):
    """Batch-2048 throughput of the int8 slabbed kernel at k=40 (the 4x
    rerank over-fetch) — the capacity/QPS tier: exact after the f32 rerank.
    Returns QPS or None."""
    from perceive_tpu.ops.topk import pallas_topk_int8_slabbed, quantize_queries

    try:
        halves = []
        for i in range(2):
            w = jax.random.bits(jax.random.PRNGKey(11 + i), (n // 2, d // 4), jnp.uint32)
            halves.append(jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(n // 2, d))
            del w
        m8 = jnp.concatenate(halves, axis=0)
        del halves
        m8 = jax.block_until_ready(jax.lax.bitcast_convert_type(m8, jnp.int8))
        scales2d = jax.block_until_ready(jnp.full((1, n), 0.01, jnp.float32))
        src2d = jax.block_until_ready(jnp.zeros((1, n), jnp.int32))

        def body(q, m, sc2, s2):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int8_slabbed(m, sc2, s2, qi8, qsc, allowed, 40, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

        marginal = _injit_marginal(
            body, (m8, scales2d, src2d), batch=QUERY_BATCH, d=d,
            reps=(1, 3), seed_base=500, iters=iters,
        )
        return QUERY_BATCH / marginal
    except Exception as e:  # noqa: BLE001
        print(f"# int8 slabbed kernel unavailable ({e})", flush=True)
        return None


@functools.partial(jax.jit, donate_argnums=0)
def _fill_rows(buf, vals, lo):
    return jax.lax.dynamic_update_slice(buf, vals, (lo, jnp.zeros((), jnp.int32)))


def rand_i8_chunked(key, shape, chunk_rows: int):
    """Random int8 array of ``shape``, built in leading-axis chunks with a
    donated in-place fill: a full-size random.bits call peaks at ~3x the
    matrix (uint32 counter intermediate + bitcast copies) — 11.5 GB for a
    3.84 GB corpus, an OOM when other corpora are already resident
    (15.75 GB HBM).  Shared by benchmarks/ probes (bench.py stays
    self-contained, so the helper lives here and probes import it)."""
    rows_total, cols = shape
    out = jnp.zeros(shape, jnp.int8)
    for lo in range(0, rows_total, chunk_rows):
        rows = min(chunk_rows, rows_total - lo)
        w = jax.random.bits(jax.random.fold_in(key, lo), (rows, cols // 4), jnp.uint32)
        vals = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(rows, cols), jnp.int8
        )
        out = _fill_rows(out, vals, jnp.int32(lo))
    return jax.block_until_ready(out)


def _rand_i8t(key, d: int, n: int, chunk_rows: int = 48):
    """(d, n) random int8 via rand_i8_chunked (the transposed companion)."""
    return rand_i8_chunked(key, (d, n), chunk_rows)


def _marginal_int8t_qps(n: int, d: int, allowed, *, iters=3):
    """Batch-2048 throughput of the TRANSPOSED-int8 slabbed kernel at k=40
    (the 4x rerank over-fetch at int8 precision) — the DEFAULT tier's batch
    path: int2 batches of >= 2 queries sweep the tier's int8 fine companion
    (searcher._INT2_MAX_Q = 1; int2_fine_bits picks int8 at this corpus
    size).  Measured identical to the row-major int8 slab (probe_int8t:
    19.19k vs 19.21k QPS).  Returns QPS or None."""
    from perceive_tpu.ops.topk import pallas_topk_int8t_slabbed, quantize_queries

    try:
        m8t = _rand_i8t(jax.random.PRNGKey(17), d, n)
        scales2d = jax.block_until_ready(jnp.full((1, n), 0.01, jnp.float32))
        src2d = jax.block_until_ready(jnp.zeros((1, n), jnp.int32))

        def body(q, m, sc2, s2):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int8t_slabbed(m, sc2, s2, qi8, qsc, allowed, 40, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

        marginal = _injit_marginal(
            body, (m8t, scales2d, src2d), batch=QUERY_BATCH, d=d,
            reps=(1, 3), seed_base=900, iters=iters,
        )
        return QUERY_BATCH / marginal
    except Exception as e:  # noqa: BLE001
        print(f"# int8t slabbed kernel unavailable ({e})", flush=True)
        return None


def _marginal_int4_qps(n: int, d: int, allowed, *, iters=3):
    """Batch-2048 throughput of the int4 SLABBED kernel at k=80 (the 8x
    rerank over-fetch for k=10) — the CAPACITY tier's batch throughput
    (>24M-row corpora, and the int2 tier's batch path when its companion
    is int4).  Returns QPS or None."""
    from perceive_tpu.ops.topk import pallas_topk_int4_slabbed, quantize_queries

    try:
        words = jax.random.bits(jax.random.PRNGKey(23), (d // 2, n // 4), jnp.uint32)
        packed = jax.block_until_ready(
            jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(d // 2, n)
        )
        del words
        scales2d = jax.block_until_ready(jnp.full((1, n), 0.01, jnp.float32))
        src2d = jax.block_until_ready(jnp.zeros((1, n), jnp.int32))

        def body(q, m, sc2, s2):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int4_slabbed(m, sc2, s2, qi8, qsc, allowed, 80, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

        marginal = _injit_marginal(
            body, (packed, scales2d, src2d), batch=QUERY_BATCH, d=d,
            reps=(1, 3), seed_base=700, iters=iters,
        )
        return QUERY_BATCH / marginal
    except Exception as e:  # noqa: BLE001
        print(f"# int4 slabbed kernel unavailable ({e})", flush=True)
        return None


def _marginal_single_query_tiers(n: int, d: int, allowed, *, rounds=10, r=8):
    """Single-query p50 of BOTH quantized tiers, measured INTERLEAVED:

      int2: the coarse-to-fine default tier (pallas 2-bit sweep -> exact
            hierarchical top-4096 -> in-jit INT8-companion rescore to the
            k=128 over-fetch, one compiled program,
            ops/topk.scan_int2_coarse_fine with fine_bits=8 — the
            production companion at this corpus size, int2_fine_bits)
      int4: the capacity tier's candidate pass (k=128 over-fetch)

    Sequential per-tier measurement carries ~0.6 ms of cross-process /
    chip-weather drift — enough to RANK THE TIERS WRONG (BENCH_NOTES
    round-3 probe_tier_ab, which this mirrors): so both pipelines compile
    first, then A/B/A/B alternating rounds of the in-jit repeat marginal,
    median per tier.  The f32 rerank of 128 candidates is host-side
    microseconds, so these marginals ARE the p50s.  Returns
    (int2_seconds, int4_seconds), either None on kernel failure."""
    from perceive_tpu.index.searcher import _scan_topk_xla_int8t_impl
    from perceive_tpu.ops.topk import (
        pallas_topk_int4_unsorted,
        quantize_queries,
        scan_int2_coarse_fine,
    )

    def gen_packed(key, rows):
        w = jax.random.bits(key, (rows, n // 4), jnp.uint32)
        return jax.block_until_ready(
            jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(rows, n)
        )

    def consistent_int2_corpus(key):
        """ONE normalized gaussian row set quantized into BOTH the int2
        coarse matrix (matrix._quantize2 semantics: {-3,-1,1,3} grid at
        s=rms/2, planes 0-2 raw crumbs + plane 3 two's complement) and the
        transposed int8 companion (matrix._quantize: absmax/127).  The
        round-4 corpora were INDEPENDENT random bytes — fine for timing,
        but recall against them is chance overlap (kc/n ~ 4e-4), so the
        per-run recall keys (VERDICT r4 #6) require this consistent build.
        Chunked: the f32 transient stays under 1 GB."""
        d4 = d // 4
        chunk = n // 16
        p2 = jnp.zeros((d4, n), jnp.uint8)
        m8 = jnp.zeros((d, n), jnp.int8)
        s2 = jnp.zeros((n,), jnp.float32)
        s8 = jnp.zeros((n,), jnp.float32)

        @jax.jit
        def gen(k):
            f = jax.random.normal(k, (chunk, d), jnp.float32)
            f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
            sc2 = jnp.maximum(jnp.sqrt(jnp.mean(f * f, axis=1)) / 2.0, 1e-12)
            c = jnp.clip(
                jnp.round((f / sc2[:, None] + 3.0) / 2.0), 0, 3
            ).astype(jnp.uint8)
            t3 = (c[:, 3 * d4 :] - 2) & 3
            pk = (
                c[:, :d4]
                | (c[:, d4 : 2 * d4] << 2)
                | (c[:, 2 * d4 : 3 * d4] << 4)
                | (t3 << 6)
            )
            sc8 = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-12) / 127.0
            q8 = jnp.clip(jnp.round(f / sc8[:, None]), -127, 127).astype(jnp.int8)
            return pk.T, sc2, q8.T, sc8

        fill_m = jax.jit(
            lambda mm, cc, i: jax.lax.dynamic_update_slice(mm, cc, (jnp.int32(0), i)),
            donate_argnums=0,
        )
        fill_v = jax.jit(
            lambda vv, cc, i: jax.lax.dynamic_update_slice(vv, cc, (i,)),
            donate_argnums=0,
        )
        for lo in range(0, n, chunk):
            pk, sc2c, q8c, sc8c = gen(jax.random.fold_in(key, lo))
            i = jnp.int32(lo)
            p2 = fill_m(p2, pk, i)
            m8 = fill_m(m8, q8c, i)
            s2 = fill_v(s2, sc2c, i)
            s8 = fill_v(s8, sc8c, i)
            del pk, sc2c, q8c, sc8c
        return (
            jax.block_until_ready(p2),
            jax.block_until_ready(s2),
            jax.block_until_ready(m8),
            jax.block_until_ready(s8),
        )

    def queries(seed, reps):
        q = jax.random.normal(jax.random.PRNGKey(seed), (reps, 1, d), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def loop(reps, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, reps, it, 0.0)
        return jax.jit(f)

    try:
        packed4 = gen_packed(jax.random.PRNGKey(13), d // 2)
        packed2 = gen_packed(jax.random.PRNGKey(11), d // 4)
        # the int2 tier's PRODUCTION fine companion at this corpus size is
        # int8 (int2_fine_bits: 10M x 384 x 1.25 B/dim = 4.8 GB fits the
        # budget), so the coarse-to-fine pipeline is measured against an
        # int8 (D, N) companion — chunk-built (_rand_i8t) because a
        # full-size build's transients would OOM on top of the 2.9 GB
        # packed corpora (15.75 GB HBM).  These TIMING corpora are
        # independent random bytes (value-independent compute; keeps the
        # exact cached program structure) — the recall phase below builds
        # its own CONSISTENT corpus after these are freed.
        m8t = _rand_i8t(jax.random.PRNGKey(17), d, n)
        scales = jax.block_until_ready(jnp.full((n,), 0.01, jnp.float32))
        scales2d = jax.block_until_ready(scales.reshape(1, n))
        src = jax.block_until_ready(jnp.zeros((n,), jnp.int32))
        src2d = jax.block_until_ready(src.reshape(1, n))
    except Exception as e:  # noqa: BLE001 — no corpora, nothing to measure
        print(f"# quantized single-query tiers unavailable ({e})", flush=True)
        return None, None, None

    def body_int2(q, p2, sc, s1, m8):
        v, rows, fl = scan_int2_coarse_fine(
            p2, sc, m8, sc, s1, q, allowed, 128, fine_bits=8
        )
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)

    def body_int4(q, p4, sc2, s2):
        qi8, qsc = quantize_queries(q)
        v, rows = pallas_topk_int4_unsorted(p4, sc2, s2, qi8, qsc, allowed, 128, False)
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

    def measure_recall(nq: int = 128, kc: int = 4096) -> dict | None:
        """Served recall of the PRODUCTION coarse-to-fine pipeline vs its
        own escalation reference (the full int8 fine-companion sweep), on
        the bench corpus, THIS run (VERDICT r4 #6: with approx_max_k the
        default select, recall parity is an audited claim — the artifact
        must carry the measured number, not a BENCH_NOTES citation).

          candidate_recall_at_10: fraction of the reference top-10 present
            in the coarse pass's selected candidate set (the quantity the
            approx-select bin-collision risk governs; tie-insensitive)
          agreement_at_10: top-10 set agreement of the served pipeline vs
            the reference (carries int8-precision tie swaps, so it can
            read slightly below candidate recall without any true miss)
        """
        from perceive_tpu.ops.topk import (
            _INT2_APPROX_RT as _rt,
            pallas_int2_scores,
            quantize_queries,
            scan_int2_coarse_fine as _scf,
        )

        try:
            B = 8
            # the recall corpus must be CONSISTENT (one row set quantized
            # into both tiers) — the timing corpora above are independent
            # random bytes whose cross-tier overlap is chance (kc/n).
            # They are freed by the caller before this runs.
            rp2, rs2, rm8, rs8 = consistent_int2_corpus(jax.random.PRNGKey(29))

            # the candidate SET is approx_max_k's output directly — no
            # 4096-wide fine phase (that larger program repeatedly broke
            # this session's remote compile endpoint mid-compile); arrays
            # as jit ARGS, never captured (BENCH_NOTES round-5 op notes)
            @jax.jit
            def f_cand(q, p2, sc, s1, al):
                qi8, qscale = quantize_queries(q)
                coarse = pallas_int2_scores(
                    p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale,
                    al, False, n,
                )
                outs = [
                    jax.lax.approx_max_k(coarse[i], kc, recall_target=_rt)
                    for i in range(B)
                ]
                return jnp.stack([p for _, p in outs])

            @jax.jit
            def f_got(q, p2, sc, s1, m8, sc8, al):
                return _scf(
                    p2, sc, m8, sc8, s1, q, al, 10,
                    fine_bits=8, select="approx",
                )

            @jax.jit
            def f_ref(q, m8, sc8, s1, al):
                return _scan_topk_xla_int8t_impl(m8, sc8, s1, q, al, 10)[1]

            # Escalation semantics, mirrored at the kernel level: production
            # re-sweeps the FULL fine companion whenever the served kth
            # score cannot clear the coarse floor (searcher._scan) — which
            # is exactly the f_ref program, so an escalated query serves the
            # reference answer by construction.  Margin 0 here (production
            # defaults to a 3-sigma noise margin, which escalates strictly
            # MORE), so these keys are a LOWER bound on served recall.
            cand_hits = agree_hits = total = esc = 0
            for i in range(0, nq, B):
                q = queries(7000 + i, B)[:, 0, :].reshape(B, d)
                cand = np.asarray(f_cand(q, rp2, rs2, src, allowed))
                gv, gr, gf = (
                    np.asarray(x)
                    for x in f_got(q, rp2, rs2, src, rm8, rs8, allowed)
                )
                ref = np.asarray(f_ref(q, rm8, rs8, src, allowed))
                for j in range(B):
                    rset = set(ref[j][:10].tolist())
                    total += 10
                    if np.isfinite(gf[j]) and gv[j, -1] < gf[j]:
                        esc += 1  # production re-sweeps -> serves ref
                        cand_hits += 10
                        agree_hits += 10
                        continue
                    cand_hits += len(rset & set(cand[j].tolist()))
                    agree_hits += len(rset & set(gr[j][:10].tolist()))
            return {
                "recall_queries": total // 10,
                "candidate_recall_at_10": round(cand_hits / total, 6),
                "agreement_at_10": round(agree_hits / total, 6),
                "recall_escalation_rate": round(esc / (total // 10), 4),
            }
        except Exception as e:  # noqa: BLE001 — additive info
            print(f"# recall phase unavailable ({e})", flush=True)
            return None

    cases = {
        "int2": (body_int2, (packed2, scales, src, m8t)),
        "int4": (body_int4, (packed4, scales2d, src2d)),
    }
    fns = {}
    for name, (body, args) in cases.items():
        # per-tier compile fallback: one tier failing to lower must not
        # drop the other tier's number from the bench artifact
        try:
            f1, fR = loop(1, body), loop(r, body)
            np.asarray(f1(queries(0, 1), *args))  # compile + warm
            np.asarray(fR(queries(0, r), *args))
            fns[name] = (f1, fR, args)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} single-query tier unavailable ({e})", flush=True)
    marg = {name: [] for name in fns}
    for rnd in range(rounds):
        for name, (f1, fR, args) in fns.items():  # interleaved A/B
            q1 = queries(1000 + 31 * rnd, 1)
            t0 = time.perf_counter()
            np.asarray(f1(q1, *args))
            w1 = time.perf_counter() - t0
            qR = queries(5000 + 31 * rnd, r)
            t0 = time.perf_counter()
            np.asarray(fR(qR, *args))
            wR = time.perf_counter() - t0
            marg[name].append(max((wR - w1) / (r - 1), 1e-9))
    p50_int2 = float(np.median(marg["int2"])) if marg.get("int2") else None
    p50_int4 = float(np.median(marg["int4"])) if marg.get("int4") else None
    had_int2 = bool(marg.get("int2"))
    # free the TIMING corpora before the recall corpus builds (the two sets
    # together would breach HBM at 10M); then recall gets its OWN bound:
    # its fresh programs compile AFTER the headline marginals are already
    # measured, and a wedged compile there must not void the p50 numbers
    del cases, fns, marg
    del packed2, packed4, m8t, scales
    recall = (
        _with_timeout(measure_recall, min(_PHASE_TIMEOUT_S, 1800),
                      label="recall")
        if had_int2
        else None
    )
    return (p50_int2, p50_int4, recall)


def measure_serve_latency() -> dict | None:
    """End-to-end HTTP serve walls (VERDICT r3 #6): the REAL stack — tiny
    random-weight model, fs scan, ServeState warmup, coalescing executor,
    HTTP server — measured with UNIQUE queries (the result cache never
    hits) at 1 and 8 concurrent clients.  Self-contained by design (the
    driver artifact must not depend on benchmarks/); the full client
    sweep incl. 64 clients lives in benchmarks/serve_latency.py."""
    import shutil
    import tempfile
    import threading
    import time as _time
    import urllib.request

    base = tempfile.mkdtemp(prefix="bench_serve_")
    server = None
    st = None
    try:
        from perceive_tpu.cli.state import AppState
        from perceive_tpu.db import add_source
        from perceive_tpu.serve import start_server
        from perceive_tpu.sources import scan_source
        from perceive_tpu.types import Source

        docs = f"{base}/docs"
        os.makedirs(docs)
        rng = np.random.default_rng(0)
        words = ["alpha", "beta", "gamma", "delta", "search", "vector",
                 "index", "engine", "document", "corpus", "query", "result"]
        for i in range(60):
            with open(f"{docs}/doc{i:03d}.md", "w") as f:
                f.write(" ".join(rng.choice(words, size=30)) + "\n")

        app = AppState(f"{base}/db.sqlite3")
        src = add_source(
            app.db, Source(name="docs", config={"type": "fs"}, location=docs)
        )
        scan_source(app.db, app.model, src,
                    on_embeddings=app.searcher.upsert_embeddings)
        app.refresh_sources()
        server = start_server(lambda: app, port=0)
        st = server.perceive_state
        st.ready.wait(600)
        port = server.server_address[1]

        def query(q: str) -> float:
            t0 = _time.monotonic()
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q={q}&k=10", timeout=120
            ) as r:
                r.read()
            return _time.monotonic() - t0

        for w in ("alpha%20beta", "vector%20engine", "delta"):
            query(w)  # absorb residual shape compiles

        one = [query(f"alpha%20vector%20b{i}") for i in range(12)]

        lats: list[float] = []
        lk = threading.Lock()
        bar = threading.Barrier(8)

        def client(ci: int) -> None:
            bar.wait()
            for j in range(8):
                w = query(f"corpus%20index%20c{ci}x{j}")
                with lk:
                    lats.append(w)

        t0 = _time.monotonic()
        ts = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = _time.monotonic() - t0
        return {
            "serve_1c_p50_ms": round(float(np.median(one)) * 1e3, 1),
            "serve_p50_ms": round(float(np.median(lats)) * 1e3, 1),
            "serve_p99_ms": round(float(np.quantile(lats, 0.99)) * 1e3, 1),
            "serve_qps_8c": round(64 / wall, 1),
        }
    except Exception as e:  # noqa: BLE001 — serve walls are additive info
        print(f"# serve phase unavailable ({e})", flush=True)
        return None
    finally:
        try:
            if st is not None:
                st.stop()
            if server is not None:
                server.shutdown()
        except Exception:  # noqa: BLE001
            pass
        shutil.rmtree(base, ignore_errors=True)


def measure_embed_docs_per_sec() -> float:
    """Device-side encode throughput: MiniLM-class tower (384-d, 6 layers),
    bf16, batch 256 x seq 128, distinct token batches per timed call
    (BASELINE.md config 2; the driver target is >= 5k docs/s/chip)."""
    from perceive_tpu.models import EncoderArch, HeadConfig
    from perceive_tpu.models.encoder import encode_tokens, init_params

    on_tpu = jax.default_backend() == "tpu"
    arch = EncoderArch(
        vocab_size=30522, hidden_size=384, num_layers=6, num_heads=12,
        intermediate_size=1536, max_position_embeddings=512,
    )
    head = HeadConfig(pooling="mean", normalize=True)
    params = init_params(jax.random.PRNGKey(0), arch, head)

    impl = "tpu" if on_tpu else "xla"  # per-bucket routed production impl

    def batches(seed, r):
        # seed-keyed generation: distinct inputs per timed call is what
        # defeats the tunnel's (program, args) memoization (module docstring)
        rng = np.random.default_rng(seed)
        ids = rng.integers(0, arch.vocab_size, (r, EMBED_BATCH, EMBED_SEQ)).astype(np.int32)
        lens = rng.integers(EMBED_SEQ // 2, EMBED_SEQ + 1, (r, EMBED_BATCH))
        mask = (np.arange(EMBED_SEQ)[None, None, :] < lens[:, :, None]).astype(np.int32)
        return (
            jax.block_until_ready(jnp.asarray(ids)),
            jax.block_until_ready(jnp.asarray(mask)),
        )

    # in-jit repeat marginal (module docstring): R distinct batches inside
    # one dispatch; tunnel round trips never enter the throughput number
    def make(r):
        def f(p, ids, mask):
            def it(i, acc):
                emb = encode_tokens(
                    p, arch, head, ids[i], mask[i], None,
                    compute_dtype=jnp.bfloat16, attention_impl=impl,
                )
                return acc + jnp.sum(emb)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return jax.jit(f)

    reps = (1, 9) if on_tpu else (1, 2)
    walls = {}
    for r in reps:
        fn = make(r)
        np.asarray(fn(params, *batches(1, r)))  # compile + warm
        ts = []
        for i in range(3):
            b = batches(100 + 7 * i + r, r)
            t0 = time.perf_counter()
            np.asarray(fn(params, *b))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    marginal = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
    return EMBED_BATCH / marginal


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    # row count padded to the kernel's 4096 tile (>= the 10M target corpus)
    n = 10_002_432 if on_tpu else 102_400
    d = 384

    # device-weather preamble (VERDICT r4 #2): a degraded tunnel/chip shows
    # 2-75x swings on the dispatch-heavy secondary walls; stamp the run and
    # retry ONCE after a cool-down before measuring anything expensive
    health = {}
    if on_tpu:
        health["pre"] = measure_health("pre")
        if health["pre"]["degraded"]:
            print("# device degraded at preamble; cooling down 120 s", flush=True)
            time.sleep(120)
            health["pre_retry"] = measure_health("pre_retry")

    matrix = jax.block_until_ready(jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.bfloat16))
    source_ids = jax.block_until_ready(jnp.zeros((n,), jnp.int32))
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))

    sweep, _ = _marginal_sweep_s(
        matrix, source_ids, allowed, QUERY_BATCH, K, reps=(1, 5) if on_tpu else (1, 2)
    )
    qps = QUERY_BATCH / sweep
    p50_s, wall1 = _marginal_sweep_s(
        matrix, source_ids, allowed, 1, 16, reps=(1, 9) if on_tpu else (1, 3)
    )
    p50_ms = p50_s * 1e3

    del matrix  # free 7.7 GB before the int2/int4/int8 corpora / embed tower
    if on_tpu:
        health["post_bf16"] = measure_health("post_bf16")
    p50_int2_s, p50_int4_s, recall = (
        _with_timeout(
            lambda: _marginal_single_query_tiers(n, d, allowed),
            _PHASE_TIMEOUT_S, default=(None, None, None), label="tier-phase",
        )
        if on_tpu
        else (None, None, None)
    )
    qps_int8t = (
        _with_timeout(lambda: _marginal_int8t_qps(n, d, allowed),
                      _PHASE_TIMEOUT_S, label="int8t-qps")
        if on_tpu else None
    )
    qps_int4 = (
        _with_timeout(lambda: _marginal_int4_qps(n, d, allowed),
                      _PHASE_TIMEOUT_S, label="int4-qps")
        if on_tpu else None
    )
    qps_int8 = (
        _with_timeout(lambda: _marginal_int8_qps(n, d, allowed),
                      _PHASE_TIMEOUT_S, label="int8-qps")
        if on_tpu else None
    )
    if on_tpu:
        health["post_tiers"] = measure_health("post_tiers")
    embed_dps = _with_timeout(
        measure_embed_docs_per_sec, _PHASE_TIMEOUT_S, label="embed"
    )
    serve_stats = (
        _with_timeout(measure_serve_latency, _PHASE_TIMEOUT_S, label="serve")
        if on_tpu else None
    )

    # The DEFAULT configuration at this corpus size is the int2 coarse-to-
    # fine tier (index.matrix.auto_matrix_dtype: 4M-24M rows -> int2) with
    # an INT8 fine companion (int2_fine_bits), so the headline is the
    # default tier's single-query p50 against the 2 ms BASELINE.md target
    # (VERDICT r2 #2: report what an out-of-the-box serve actually ships,
    # not an opt-in env configuration).  vs_baseline is target_ms /
    # measured_ms, >1 = beating the target.  Batch throughput of the
    # default tier is the TRANSPOSED-int8 slab number: int2 batches of
    # >=2 queries route to the int8t kernels on the tier's fine companion
    # (searcher._INT2_MAX_Q = 1, measured crossover probe_int2r).
    headline_p50_ms = (p50_int2_s or p50_int4_s or p50_s) * 1e3
    print(
        json.dumps(
            {
                "metric": f"p50_default_tier_exact_top{K}_ms_{n}x{d}",
                "value": round(headline_p50_ms, 3),
                "unit": "ms",
                "vs_baseline": round(2.0 / headline_p50_ms, 3),
                "default_tier": (
                    "int2-coarse-to-fine+f32rerank (auto)" if p50_int2_s
                    else "int4+f32rerank" if p50_int4_s
                    else "bf16 (off-TPU fallback)"
                ),
                "p50_int4_rerank_ms": p50_int4_s and round(p50_int4_s * 1e3, 3),
                # default tier batch throughput (transposed-int8 slabbed
                # kernel on the int8 fine companion, k=40 over-fetch;
                # exact after the f32 rerank)
                "qps_default_tier_batch2048": qps_int8t and round(qps_int8t, 1),
                # capacity tier (>24M rows) batch throughput
                "qps_int4_batch2048": qps_int4 and round(qps_int4, 1),
                "qps_bf16_batch2048": round(qps, 1),
                "qps_bf16_vs_10k_target": round(qps / 10_000.0, 3),
                "p50_bf16_ms": round(p50_ms, 3),
                # int8 + rerank: the capacity/throughput tier
                "qps_int8_rerank": qps_int8 and round(qps_int8, 1),
                "tunnel_roundtrip_ms": round(wall1 * 1e3, 3),
                "sweep_ms_batch2048": round(sweep * 1e3, 3),
                # HBM rate of the SINGLE-query bf16 sweep (bandwidth-bound;
                # the batch sweep is MXU-bound so bytes/time would mislead)
                "effective_gbps": round(n * d * 2 / p50_s / 1e9, 1),
                "embed_docs_per_sec": embed_dps and round(embed_dps, 1),
                "embed_vs_baseline": embed_dps and round(embed_dps / 5_000.0, 3),
                # end-to-end HTTP serve walls (VERDICT r3 #6): unique
                # queries (the result cache never hits) against the real
                # stack — encoder + fused sweep + retrieve + highlight
                # behind the coalescing executor; p50/p99 at 8 concurrent
                # clients plus the 1-client wall.  None when the serve
                # phase failed (keys stay present so dashboards don't
                # shift).
                **(serve_stats or {
                    "serve_p50_ms": None, "serve_p99_ms": None,
                    "serve_qps_8c": None, "serve_1c_p50_ms": None,
                }),
                # from the measured p50(N) scaling fit (probe_p50_scaling:
                # 0.1825 ns/row streaming + 0.767 ms fixed, residuals
                # < 0.05 ms; fitted for THIS tier/shape on the v5e bench
                # chip): the streaming term scaled by the HBM ratio
                # brackets the target hardware's p50.  Only emitted for
                # the fitted configuration — on other corpora/tiers/
                # hardware the fit doesn't apply.
                "p50_v5p_projection_ms": (
                    "0.92-1.31 (probe_p50_scaling fit)"
                    if p50_int2_s and (n, d) == (10_002_432, 384)
                    and jax.default_backend() == "tpu"
                    else None
                ),
                # measured served recall of the default tier THIS run
                # (VERDICT r4 #6): candidate recall vs the pipeline's own
                # escalation reference on the bench corpus; the shipped
                # select variant + fetch are the production defaults
                **(recall or {
                    "candidate_recall_at_10": None, "agreement_at_10": None,
                    "recall_queries": None, "recall_escalation_rate": None,
                }),
                "coarse_select": f"approx(rt={_INT2_APPROX_RT})+self-audit",
                # device-weather stamps (VERDICT r4 #2): per-phase health
                # probes vs the stored healthy-session calibration; any
                # degraded:true means the NEARBY key group was measured on
                # a sick tunnel/chip and capability figures live in
                # BENCH_NOTES instead
                "health": health or None,
                "degraded_any": (
                    any(h["degraded"] for h in health.values())
                    if health else None
                ),
                "timing_method": (
                    "in-jit repeat marginal; int2/int4 p50 A/B-interleaved "
                    "(module docstring)"
                ),
                "backend": jax.default_backend(),
                "corpus_rows": n,
            }
        )
    )


def main_ingest() -> None:
    """End-to-end ingest: synthetic 10k-doc fs tree through the real
    pipeline (scan -> match -> read x8 -> TPU embed -> SQLite write) with
    per-stage wall attribution from ScanStats (VERDICT r1 #5)."""
    import shutil
    import tempfile

    from perceive_tpu.db import Database, add_source
    from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab
    from perceive_tpu.sources.pipeline import scan_source
    from perceive_tpu.types import Source

    import os

    default_docs = 10_000 if jax.default_backend() == "tpu" else 500
    n_docs = int(os.environ.get("PERCEIVE_TPU_BENCH_DOCS", default_docs))
    words = ["alpha", "beta", "gamma", "delta", "search", "vector", "index",
             "engine", "document", "corpus", "query", "result"]
    base = tempfile.mkdtemp(prefix="ingest_bench_")
    root = f"{base}/tree"  # DB lives OUTSIDE the scanned tree
    try:
        os.makedirs(root)
        rng = np.random.default_rng(0)
        for i in range(n_docs):
            body = " ".join(rng.choice(words, size=60))
            with open(f"{root}/doc{i:05d}.md", "w") as f:
                f.write(f"---\ntitle: doc {i}\n---\n{body}\n")

        db = Database(f"{base}/bench.sqlite3")
        arch = EncoderArch(
            vocab_size=64, hidden_size=384, num_layers=6, num_heads=12,
            intermediate_size=1536, max_position_embeddings=512,
        )
        tok = TextTokenizer.from_vocab(tiny_test_vocab(words), max_seq_length=128)
        model = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok,
                             compute_dtype=jnp.bfloat16, attention_impl="auto", model_id=1)
        src = add_source(db, Source(name="bench", config={"type": "fs"}, location=root))

        # warm the jit cache for the shapes the scan will hit (full batches
        # + the tail batch) — a serving process compiles once, not per scan,
        # and through the tunnel each compile costs 30-60 s
        from perceive_tpu.models.model import BATCH_BUCKETS, batch_bucket
        from perceive_tpu.sources.pipeline import EMBED_BATCH_SIZE

        sample = open(f"{root}/doc00000.md").read()
        full = min(EMBED_BATCH_SIZE, BATCH_BUCKETS[-1], max(n_docs, 1))
        model.materialize(model.encode_dispatch([sample] * full))
        tail = n_docs % full or full
        if batch_bucket(tail) != full:
            model.materialize(model.encode_dispatch([sample] * tail))

        t0 = time.perf_counter()
        stats, ok = scan_source(db, model, src)
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "ingest_e2e_docs_per_sec",
                    "value": round(n_docs / wall, 1),
                    "unit": "docs/s",
                    "vs_baseline": round(n_docs / wall / 5_000.0, 3),
                    "ok": ok,
                    "wall_s": round(wall, 2),
                    **stats.summary(),
                    "backend": jax.default_backend(),
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    import sys

    # persistent jit cache, same policy as the CLI/serve paths: through the
    # tunnel compiler a cold run pays minutes of first-compiles (and can
    # blow a driver timeout on a degraded chip); cached re-runs pay none
    from perceive_tpu.cli.state import _enable_jit_cache

    _enable_jit_cache()

    if "--ingest" in sys.argv:
        main_ingest()
    else:
        main()
        # a phase worker thread may still be blocked inside a wedged native
        # compile call (_with_timeout); the JSON line is printed+flushed,
        # so exit hard rather than hang interpreter teardown on it
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
