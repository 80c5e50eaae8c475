"""Probe round 22: EXACT tile-bound pruning — the only lever left with
order-of-magnitude latency headroom on this chip (probe_int2x: the full
int2 sweep is at its local optimum; its floor is reading 960 MB).

Idea: keep per-TILE (4096 rows) stats — centroid mu_t and radius
r_t = max ||v - mu_t|| — of the exact stored vectors.  For a unit query
q, every row in tile t satisfies  q.v <= q.mu_t + r_t  (Cauchy-Schwarz),
an EXACT upper bound B_t.  Sweep only the top-P tiles by bound via a
scalar-prefetch gather kernel; the (P+1)-th bound is a PROVABLE floor on
every unswept row — same escalation semantics as the int2 tier's coarse
floor, but deterministic instead of statistical.  On clustered corpora
(real embeddings) locality makes most tiles prunable; on gaussian
corpora bounds are uniform and the path escalates — production must
auto-disable there (measured here).

Corpus: 10M x 384, CLUSTER-CONTIGUOUS rows (cid = row // 4884, 2048
centers), rows = normalize(center + LAM * UNIT noise) so within-cluster
cosine is ~1/(1+LAM^2) ~ 0.72 (to-center ~0.85).  NOTE: recall_int2's
"clustered" generator scales RAW gaussian noise (norm ~sqrt(D)*LAM ~ 12),
which makes within-cluster cosine ~0.006 — an isotropic corpus with a
flat score landscape (fine as its dense-tie stress, but NOT clusters).
Real sentence-embedding corpora cluster topically; this probe normalizes
the noise to model that, and keeps the raw-noise case as MODE=gaussian.

Measures:
  1. gather-kernel correctness vs xla_scores_int4 on permuted tiles
  2. pruned-pipeline latency at P in {2442(all), 612, 306, 152, 76}
     vs the production full int4 sweep (k=128)
  3. candidate-recall@10 of the pruned fetch-128 vs the bf16 oracle,
     and the measured escalation rate (oracle k-th < prune floor),
     per P, over 256 mid-cluster queries
  4. the same with GAUSSIAN rows (escalation-rate sanity: ~1.0)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    _VMEM_LIMIT,
    _select_topk_hier,
    pallas_topk_int4_unsorted,
    pallas_topk_unsorted,
    quantize_queries,
    unpack_int4_xla,
)

N, D = 10_002_432, 384
D2 = D // 2
TILE = 4096
T = N // TILE  # 2442
K, FETCH = 10, 128
MODE = sys.argv[1] if len(sys.argv) > 1 else "clustered"
# cluster count is the probe's main axis: the bound's radius term only
# prunes when clusters span >> 1 tile (boundary tiles get a mixed
# centroid and a ~2x radius, and their count scales with N_CLUSTERS)
N_CLUSTERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
ROWS_PER_CLUSTER = N // N_CLUSTERS
LAM = 0.62
CHUNK = 1_667_072  # 407 tiles * 4096; 6 chunks = N
N_QUERIES = 256


# recall_int2's helpers, inlined (it parses sys.argv at import time)
def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@jax.jit
def _pack_chunk_int4(rows_bf16):
    """Mirrors EmbeddingMatrix._quantize4 (see recall_int2)."""
    f = rows_bf16.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-12) / 7.0
    q = jnp.clip(jnp.round(f / scales[:, None]), -7, 7).astype(jnp.int32)
    lo = (q[:, :D2] + 8).astype(jnp.uint8)
    hi = (q[:, D2:] & 15).astype(jnp.uint8)
    return (lo | (hi << 4)).T, scales


# --- gather-swept int4 scores kernel (scalar-prefetched tile ids) --------

def _gather_kernel_int4(tids_ref, qlo_ref, qhi_ref, qcorr_ref, qscale_ref,
                        m_ref, scales_ref, out_ref):
    # same nibble algebra as _scan_kernel_int4 (ops/topk.py)
    p = m_ref[:]
    lo = jax.lax.bitcast_convert_type(p & jnp.uint8(15), jnp.int8)
    x8 = jax.lax.bitcast_convert_type(p, jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m1 = jax.lax.dot_general(qlo_ref[:], lo, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(qhi_ref[:], x8, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(qhi_ref[:], lo, dims, preferred_element_type=jnp.int32)
    raw = m1.astype(jnp.float32) + (m2 - m3).astype(jnp.float32) * 0.0625 + qcorr_ref[:]
    out_ref[:] = raw * scales_ref[:] * qscale_ref[:]


def gather_scores_int4(packed, scales2d, qi8, qscale, tids):
    """(Q, P*TILE) f32 int4 scores of the tiles named by ``tids`` (P,) i32,
    streamed by a scalar-prefetch gather grid."""
    d2, n = packed.shape
    nq = qi8.shape[0]
    p_tiles = tids.shape[0]
    qlo, qhi = qi8[:, :d2], qi8[:, d2:]
    qcorr = (-8.0 * jnp.sum(qlo.astype(jnp.int32), axis=1, keepdims=True)).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p_tiles,),
        in_specs=[
            pl.BlockSpec((nq, d2), lambda i, tids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d2), lambda i, tids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i, tids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i, tids: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, TILE), lambda i, tids: (0, tids[i]), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, tids: (0, tids[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, TILE), lambda i, tids: (0, i), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _gather_kernel_int4,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, p_tiles * TILE), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(tids, qlo, qhi, qcorr, qscale, packed, scales2d)


# --- pruned pipeline ------------------------------------------------------

def pruned_topk(q, packed4, scales2d, cent, rad, p_tiles: int, fetch: int):
    """((1, fetch) int4 vals, (1, fetch) rows, () f32 prune floor)."""
    qi8, qscale = quantize_queries(q)
    bounds = cent @ q[0] + rad  # (T,) exact upper bound per tile
    nt = bounds.shape[0]
    if p_tiles >= nt:  # sweep everything: nothing unswept to bound
        tids = jnp.arange(nt, dtype=jnp.int32)
        floor = jnp.float32(-jnp.inf)
    else:
        bv, bidx = jax.lax.top_k(bounds, p_tiles + 1)
        floor = bv[p_tiles]  # bound on every unswept row
        tids = jnp.sort(bidx[:p_tiles]).astype(jnp.int32)  # ascending DMA order
    scores = gather_scores_int4(packed4, scales2d, qi8, qscale, tids)
    v, pos = _select_topk_hier(scores[0], fetch)
    rows = jnp.take(tids, pos // TILE) * TILE + pos % TILE
    return v[None, :], rows[None, :], floor


@functools.partial(jax.jit, static_argnames=("offset",))
def _gen_chunk(key, centers, offset: int):
    idx = offset + jnp.arange(CHUNK)
    if MODE == "clustered":
        cids = idx // ROWS_PER_CLUSTER  # CONTIGUOUS clusters (ingest order)
        noise = _normalize(jax.random.normal(key, (CHUNK, D), jnp.float32))
        rows = _normalize(centers[cids] + LAM * noise)
    else:
        rows = _normalize(jax.random.normal(key, (CHUNK, D), jnp.float32))
    return rows.astype(jnp.bfloat16)


@jax.jit
def _tile_stats(rows_bf16):
    """(per-tile centroid (t, D) f32, radius (t,) f32) of a chunk."""
    f = rows_bf16.astype(jnp.float32).reshape(-1, TILE, D)
    mu = jnp.mean(f, axis=1)
    r = jnp.sqrt(jnp.max(jnp.sum((f - mu[:, None, :]) ** 2, axis=2), axis=1))
    return mu, r


def main():
    assert jax.default_backend() == "tpu"
    print(f"mode: {MODE}", flush=True)
    t0 = time.time()
    centers = jax.block_until_ready(_normalize(
        jax.random.normal(jax.random.PRNGKey(99), (N_CLUSTERS, D), jnp.float32)))
    upd_rows = jax.jit(
        lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (i, 0)), donate_argnums=(0,))
    upd_cols = jax.jit(
        lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (jnp.int32(0), i)),
        donate_argnums=(0,))
    matrix = jnp.zeros((N, D), jnp.bfloat16)
    p4 = jnp.zeros((D2, N), jnp.uint8)
    s4 = jnp.zeros((N,), jnp.float32)
    cent = jnp.zeros((T, D), jnp.float32)
    rad = jnp.zeros((T,), jnp.float32)
    for j, kk in enumerate(jax.random.split(jax.random.PRNGKey(0), N // CHUNK)):
        c = _gen_chunk(kk, centers, j * CHUNK)
        off = jnp.int32(j * CHUNK)
        matrix = upd_rows(matrix, c, off)
        b, sb = _pack_chunk_int4(c)
        p4 = upd_cols(p4, b, off)
        s4 = jax.lax.dynamic_update_slice(s4, sb, (off,))
        mu, r = _tile_stats(c)
        cent = jax.lax.dynamic_update_slice(cent, mu, (jnp.int32(j * (CHUNK // TILE)), 0))
        rad = jax.lax.dynamic_update_slice(rad, r, (jnp.int32(j * (CHUNK // TILE)),))
        del c, b, sb, mu, r
    jax.block_until_ready((matrix, p4, s4, cent, rad))
    scales2d = s4.reshape(1, N)
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))
    print(f"gen+pack+stats: {time.time()-t0:.0f}s", flush=True)

    # 1. gather-kernel correctness on a permuted subset
    rng = np.random.default_rng(3)
    tids_np = np.sort(rng.choice(T, 16, replace=False)).astype(np.int32)
    q0 = jnp.asarray(_normalize(rng.standard_normal((1, D)).astype(np.float32)))
    qi8, qsc = quantize_queries(q0)
    got = np.asarray(jax.jit(gather_scores_int4)(
        p4, scales2d, qi8, qsc, jnp.asarray(tids_np)))
    ref = np.asarray(jax.jit(
        lambda p, s, qi, qs: (jax.lax.dot_general(
            qi, unpack_int4_xla(p), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * s * qs)
    )(p4, scales2d, qi8, qsc))
    for k_, t_ in enumerate(tids_np):
        np.testing.assert_allclose(
            got[0, k_ * TILE : (k_ + 1) * TILE], ref[0, t_ * TILE : (t_ + 1) * TILE],
            rtol=1e-5)
    print("gather kernel exact vs xla_scores_int4", flush=True)

    # 2. latency at P levels vs the full production int4 sweep
    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def queries(seed, r):
        q = rng.standard_normal((r, 1, D)).astype(np.float32)
        if MODE == "clustered":
            q /= np.linalg.norm(q, axis=2, keepdims=True)
            cids = rng.integers(0, N_CLUSTERS, r)
            q = np.asarray(centers)[cids][:, None, :] + 0.2 * q
        return jax.block_until_ready(jnp.asarray(
            q / np.linalg.norm(q, axis=2, keepdims=True)))

    def marginal(label, mk, args, reps=(2, 12), iters=5):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(0, r), *args))
            ts = []
            for i in range(iters):
                qs = queries(i + 1, r)
                t1 = time.perf_counter()
                np.asarray(fn(qs, *args))
                ts.append(time.perf_counter() - t1)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms", flush=True)
        return marg

    def mk_full(r):
        def body(q, pp4, sc2, sr2):
            qi, qs = quantize_queries(q)
            v, rows = pallas_topk_int4_unsorted(pp4, sc2, sr2, qi, qs, allowed, FETCH, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return loop(r, body)

    marginal("full int4 sweep k=128", mk_full, (p4, scales2d, src2d))
    for P in (2442, 612, 306, 152, 76):
        def mk_p(r, P=P):
            def body(q, pp4, sc2, ce, ra):
                v, rows, fl = pruned_topk(q, pp4, sc2, ce, ra, P, FETCH)
                return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + fl
            return loop(r, body)
        # small-P sweeps cost <1 ms: widen the rep spread so the marginal
        # clears the ~±5 ms tunnel noise on each wall
        marginal(f"pruned P={P} ({100.0*P/T:.1f}% swept)", mk_p,
                 (p4, scales2d, cent, rad), reps=(2, 12) if P > 1000 else (2, 52))

    # 3. recall + escalation rate per P
    @functools.partial(jax.jit, static_argnames=("P",))
    def check(q, m, pp4, sc2, sr2, ce, ra, P: int):
        v, rows, floor = pruned_topk(q, pp4, sc2, ce, ra, P, FETCH)
        cand = m[jnp.clip(rows, 0, N - 1)]
        exact = jnp.einsum("qfd,qd->qf", cand, q.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        rv, rperm = jax.lax.top_k(exact, K)
        rrows = jnp.take_along_axis(rows, rperm, axis=1)
        ov, orows = pallas_topk_unsorted(m, sr2, q.astype(jnp.bfloat16), allowed, 16, False)
        osv, osp = jax.lax.top_k(ov, K)
        orows10 = jnp.take_along_axis(orows, osp, axis=1)
        return orows10, rrows, rv, floor

    for P in (612, 306, 152, 76):
        hit = esc = 0
        for i in range(N_QUERIES):
            q = queries(1000 + i, 1)[0]
            orows, rrows, rv, floor = (np.asarray(x) for x in check(
                q, matrix, p4, scales2d, src2d, cent, rad, P))
            rset = set(rrows[0].tolist())
            hit += sum(int(r) in rset for r in orows[0])
            esc += int(rv[0, K - 1] < float(floor))
        print(f"P={P}: candidate-recall@{K} {hit/(K*N_QUERIES):.6f}  "
              f"escalation {esc/N_QUERIES:.4f}", flush=True)


if __name__ == "__main__":
    main()
