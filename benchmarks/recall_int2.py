"""On-chip recall + perf validation of the int2 coarse-to-fine tier at
10M x 384 (round 3; method of benchmarks/recall_10m.py).

Builds one corpus three ways — bf16 (exact oracle), packed int2 coarse,
and transposed int4 fine (the tier's companion) — using device-side
packing that mirrors EmbeddingMatrix._quantize2/_quantize4 exactly, then
runs >=1k random queries through the PRODUCTION scan_int2_coarse_fine
(pallas coarse kernel + hierarchical exact top-4096 + in-jit int4
rerank) and measures:

1. CANDIDATE RECALL: oracle-top-10 membership in the fine 128-candidate
   fetch (what the searcher's f32 rerank sees).
2. Top-10 set agreement after an oracle-arithmetic rerank (bf16-ulp ties
   interchangeable; see recall_10m.py docstring).
3. The production escalation path: queries whose k-th reranked score
   can't clear the coarse or fine floor re-run as an int4 full sweep of
   the fine matrix at fetch 2048 (searcher._scan's int2 fallback).
4. The true production p50: marginal seconds of the full coarse-to-fine
   jit on this corpus.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    pallas_topk_int4_unsorted,
    pallas_topk_unsorted,
    quantize_queries,
    scan_int2_coarse_fine,
)

import os

# shape overrides: PERCEIVE_TPU_RECALL_N / _D (round-3: validate the
# 768-d regime the default flagship model embeds in — N must stay a
# multiple of 8 and of the 12288 sweep tile)
N = int(os.environ.get("PERCEIVE_TPU_RECALL_N", 10_002_432))
D = int(os.environ.get("PERCEIVE_TPU_RECALL_D", 384))
K, FETCH = 10, 128
N_QUERIES = 1024
# coarse depth under test: argv[1], 0 = production default (int2_coarse_depth)
KC = int(sys.argv[1]) if len(sys.argv) > 1 else 0
# corpus shape: argv[2] selects among three regimes.
#   "clustered"  — rows = normalize(center + LAM*RAW gaussian noise).
#     NOTE (round-3 correction): raw D-dim noise has norm ~LAM*sqrt(D)
#     ~ 12 >> 1, so this is a near-ISOTROPIC corpus (within-cluster
#     cosine ~0.006) with a FLAT score landscape: every score is within
#     a few int2 noise widths of rank-4096.  Kept as the dense-tie /
#     tie-break stress it always actually was, under its original name
#     so earlier BENCH_NOTES rows stay reproducible.
#   "clustered2" — rows = normalize(center + LAM*UNIT noise): genuinely
#     clustered (within-cluster cosine ~1/(1+LAM^2) ~ 0.72, to-center
#     ~0.85), ~4.9k rows/cluster at 10M; queries land mid-cluster
#     (cos(q, center) ~ 0.98) where the top-10 margin over rank-4096 is
#     ~1 sigma of the same-cluster score spread — the regime real
#     topical embedding corpora live in.
#   "gaussian"   — fully random rows (the easy case).
MODE = sys.argv[2] if len(sys.argv) > 2 else "gaussian"
# selection variant under test: argv[3] ("auto"/"exact"/"approx"/...);
# approx's recall_target rides PERCEIVE_TPU_INT2_APPROX_RT (topk.py)
SELECT = sys.argv[3] if len(sys.argv) > 3 else "auto"
N_CLUSTERS = 2048
LAM = 0.62
CHUNK = N // 8
D4, D2 = D // 4, D // 2


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("offset",))
def _gen_chunk_clustered(key, centers, offset: int):
    cids = (offset + jnp.arange(CHUNK)) % N_CLUSTERS
    noise = jax.random.normal(key, (CHUNK, D), jnp.float32)
    if MODE == "clustered2":  # unit noise -> real clusters (module comment)
        noise = _normalize(noise)
    return _normalize(centers[cids] + LAM * noise).astype(jnp.bfloat16)


@jax.jit
def _gen_chunk_bf16(key):
    return _normalize(jax.random.normal(key, (CHUNK, D), jnp.float32)).astype(jnp.bfloat16)


@jax.jit
def _pack_chunk_int2(rows_bf16):
    """Mirrors EmbeddingMatrix._quantize2: uniform {-3,-1,1,3} grid at
    s = max(rms/2, eps); planes 0-2 raw crumbs, plane 3 two's complement."""
    f = rows_bf16.astype(jnp.float32)
    scales = jnp.maximum(jnp.sqrt(jnp.mean(f * f, axis=1)) / 2.0, 1e-12)
    c = jnp.clip(jnp.round((f / scales[:, None] + 3.0) / 2.0), 0, 3).astype(jnp.uint8)
    t3 = (c[:, 3 * D4 :] - 2) & 3  # uint8 wrap == two's complement bits
    packed = (
        c[:, :D4] | (c[:, D4 : 2 * D4] << 2) | (c[:, 2 * D4 : 3 * D4] << 4) | (t3 << 6)
    )
    return packed.T, scales


@jax.jit
def _pack_chunk_int4(rows_bf16):
    f = rows_bf16.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-12) / 7.0
    q = jnp.clip(jnp.round(f / scales[:, None]), -7, 7).astype(jnp.int32)
    lo = (q[:, :D2] + 8).astype(jnp.uint8)
    hi = (q[:, D2:] & 15).astype(jnp.uint8)
    return (lo | (hi << 4)).T, scales


def main():
    print(f"backend: {jax.default_backend()} mode: int2 coarse-to-fine", flush=True)
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(0), N // CHUNK)
    upd_rows = jax.jit(
        lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (i, 0)), donate_argnums=(0,)
    )
    upd_cols = jax.jit(
        lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (jnp.int32(0), i)),
        donate_argnums=(0,),
    )
    matrix = jnp.zeros((N, D), jnp.bfloat16)
    p2 = jnp.zeros((D4, N), jnp.uint8)
    p4 = jnp.zeros((D2, N), jnp.uint8)
    s2 = jnp.zeros((N,), jnp.float32)
    s4 = jnp.zeros((N,), jnp.float32)
    centers = None
    if MODE in ("clustered", "clustered2"):
        centers = jax.block_until_ready(_normalize(
            jax.random.normal(jax.random.PRNGKey(99), (N_CLUSTERS, D), jnp.float32)))
    for j, kk in enumerate(keys):
        if MODE in ("clustered", "clustered2"):
            c = _gen_chunk_clustered(kk, centers, j * CHUNK)
        else:
            c = _gen_chunk_bf16(kk)
        off = jnp.int32(j * CHUNK)
        matrix = upd_rows(matrix, c, off)
        a, sa = _pack_chunk_int2(c)
        p2 = upd_cols(p2, a, off)
        s2 = jax.lax.dynamic_update_slice(s2, sa, (off,))
        b, sb = _pack_chunk_int4(c)
        p4 = upd_cols(p4, b, off)
        s4 = jax.lax.dynamic_update_slice(s4, sb, (off,))
        del c, a, b, sa, sb
    jax.block_until_ready((matrix, p2, p4, s2, s4))
    src = jnp.zeros((N,), jnp.int32)
    src2d = src.reshape(1, N)
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))
    print(f"gen+pack: {time.time()-t0:.0f}s", flush=True)

    @jax.jit
    def scan_tier(m, pp2, ss2, pp4, ss4, s1, q):
        ov, orows = pallas_topk_unsorted(
            m, s1.reshape(1, N), q.astype(jnp.bfloat16), allowed, 16, False)
        vals, rows, floor = scan_int2_coarse_fine(
            pp2, ss2, pp4, ss4, s1, q, allowed, FETCH, k_coarse=KC, engine="pallas",
            select=SELECT)
        # oracle-arithmetic rerank of the fine candidates (see recall_10m)
        cand = m[jnp.clip(rows, 0, N - 1)]
        exact = jnp.einsum(
            "qfd,qd->qf", cand, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        exact = jnp.where(rows >= 0, exact, -jnp.inf)
        rv, rperm = jax.lax.top_k(exact, K)
        rrows = jnp.take_along_axis(rows, rperm, axis=1)
        osort_v, osort_p = jax.lax.top_k(ov, K)
        orows10 = jnp.take_along_axis(orows, osort_p, axis=1)
        return orows10, rrows, osort_v, rv, floor, vals[:, -1], rows

    @jax.jit
    def scan_fallback(m, pp4, ss4, s1, q):
        """The production escalation: int4 full sweep of the fine matrix."""
        qi8, qsc = quantize_queries(q)
        cv, crows = pallas_topk_int4_unsorted(
            pp4, ss4.reshape(1, N), s1.reshape(1, N), qi8, qsc, allowed, 2048, False)
        cand = m[jnp.clip(crows, 0, N - 1)]
        exact = jnp.einsum(
            "qfd,qd->qf", cand, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        rv, rperm = jax.lax.top_k(exact, K)
        rrows = jnp.take_along_axis(crows, rperm, axis=1)
        ov, orows = pallas_topk_unsorted(
            m, s1.reshape(1, N), q.astype(jnp.bfloat16), allowed, 16, False)
        osort_v, osort_p = jax.lax.top_k(ov, K)
        return jnp.take_along_axis(orows, osort_p, axis=1), rrows, osort_v, rv, crows

    TIE_TOL = 2.0 ** -9

    def tally(orows, rrows, ov, rv, crows):
        members, agrees = [], []
        for i in range(len(orows)):
            cset = set(crows[i].tolist())
            rset = set(rrows[i].tolist())
            members.append(sum(int(r) in cset for r in orows[i]))
            a = 0
            for j, r in enumerate(orows[i]):
                if int(r) in rset or ov[i, j] <= rv[i, -1] + TIE_TOL:
                    a += 1
            agrees.append(a)
        return members, agrees

    tot_member = tot_agree = total = n_escalate = 0
    rng = np.random.default_rng(1)
    centers_np = np.asarray(centers) if centers is not None else None
    B = 8  # the int2 coarse path is the <=8-query latency path
    for step in range(N_QUERIES // B):
        q = rng.standard_normal((B, D)).astype(np.float32)
        if MODE in ("clustered", "clustered2"):
            # mid-cluster queries (module comment; unit noise for both
            # modes so clustered2 queries sit at cos ~0.98 to the center)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            cids = rng.integers(0, N_CLUSTERS, B)
            q = centers_np[cids] + 0.2 * q
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qj = jnp.asarray(q)
        orows, rrows, ov, rv, floor, ffloor, crows = (
            np.asarray(x) for x in scan_tier(matrix, p2, s2, p4, s4, src, qj))
        members, agrees = tally(orows, rrows, ov, rv, crows)
        total += K * B
        esc = (rv[:, -1] < floor) | (rv[:, -1] < ffloor)
        n_escalate += int(esc.sum())
        if esc.any():
            orows2, rrows2, ov2, rv2, crows2 = (
                np.asarray(x) for x in scan_fallback(matrix, p4, s4, src, qj))
            m2, a2 = tally(orows2, rrows2, ov2, rv2, crows2)
            members = [y if e else x for x, y, e in zip(members, m2, esc)]
            agrees = [y if e else x for x, y, e in zip(agrees, a2, esc)]
        tot_member += sum(members)
        tot_agree += sum(agrees)
        if step % 16 == 15:
            print(f"  {(step+1)*B} queries...", flush=True)
    member_recall = tot_member / total
    agreement = tot_agree / total
    print(
        f"int2 [{MODE}] over {total // K} queries, fine fetch {FETCH}: "
        f"candidate-recall@{K}={member_recall:.6f}  "
        f"top-{K} agreement (bf16-ulp ties)={agreement:.6f}  "
        f"escalation rate={n_escalate / (total // K):.3f}",
        flush=True,
    )

    # production p50: marginal seconds of the full coarse-to-fine jit
    del matrix
    def queries(seed, r):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def make(r):
        def f(qs, pp2, ss2, pp4, ss4, s1):
            def it(i, acc):
                vals, rows, floor = scan_int2_coarse_fine(
                    pp2, ss2, pp4, ss4, s1, qs[i], allowed, FETCH, k_coarse=KC,
                    engine="pallas", select=SELECT)
                return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(floor)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return jax.jit(f)

    walls = {}
    for r in (1, 9):
        fn = make(r)
        np.asarray(fn(queries(1, r), p2, s2, p4, s4, src))
        ts = []
        for i in range(3):
            qs = queries(100 + 7 * i + r, r)
            t0 = time.perf_counter()
            np.asarray(fn(qs, p2, s2, p4, s4, src))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    marg = max((walls[9] - walls[1]) / 8, 1e-9)
    print(f"production int2 p50 marginal: {marg*1e3:.2f} ms "
          f"({N*D4/marg/1e9:.0f} GB/s of packed int2 bytes)", flush=True)

    assert member_recall >= 0.999, f"candidate recall@{K} = {member_recall}"
    assert agreement >= 0.9995, f"top-{K} agreement = {agreement}"


if __name__ == "__main__":
    main()
