"""Tier recall + escalation audit in the GENUINELY-clustered regime.

recall_int2.py's round-3 correction (its original "clustered" generator
scaled RAW gaussian noise, norm ~LAM*sqrt(D) ~ 12, i.e. an isotropic
corpus) exposed that the int2 coarse pass loses ~18% of the true top-10
on real clusters (clustered2: candidate-recall@10 0.817 ~ kc/cluster
= 4096/4884 — the within-cluster exact spread ~0.027 is SMALLER than
the int2 grid half-step rms/2 ~ 0.026, so quantization deletes the
within-cluster rank signal and the coarse pass keeps a near-random
kc-subset of the tie bulk), with the statistical floor blind to it
(escalation rate 0.000).

This probe measures what the OTHER quantized tiers do in that regime,
and whether the designed mitigation (searcher._scan's
PERCEIVE_TPU_RERANK_MARGIN_SIGMA noise margin on the escalation
trigger) restores parity at acceptable cost:

  argv: tier {int4, int8}  mode {clustered2, gaussian}  [n_rows]

Per run, over 512 queries (mid-cluster for clustered2 — the worst case:
the top-10 margin over the tie bulk is ~1 sigma of the same-cluster
spread):
  1. first-sweep candidate-recall@10 at the tier's production fetch
     depth (searcher._first_fetch bucketed: int4 kb=128, int8 kb=64)
  2. escalation-trigger rate at margin sigma = 0 (shipping default)
     and sigma = 3
  3. the FULL escalation ladder at sigma=3 (kb *= 4 per round, capped
     at 8192 like _OVERFETCH_BUCKETS): final recall@10, mean sweeps
     per query, p50-equivalent added sweeps
Gaussian mode is the control: the margin must NOT tax it (trigger ~0).

Corpus matches recall_int2's clustered2 exactly (same PRNG seeds):
2048 unit centers, rows = normalize(center + 0.62 * unit noise)
(within-cluster cosine ~0.72), ~4.9k rows/cluster at 10M; queries =
normalize(center + 0.2 * unit noise), cos(q, center) ~ 0.98.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    pallas_topk_unsorted,
    scan_topk_pallas_int4,
    scan_topk_pallas_int8,
)

TIER = sys.argv[1] if len(sys.argv) > 1 else "int4"
MODE = sys.argv[2] if len(sys.argv) > 2 else "clustered2"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10_002_432
D = 384
D2 = D // 2
K = 10
N_QUERIES = 512
N_CLUSTERS = 2048
LAM = 0.62
CHUNK = 1_667_072
assert N % CHUNK == 0
# production fetch ladders (searcher: _first_fetch -> _k_bucket, then
# want = 4*kb per escalation, capped at _OVERFETCH_BUCKETS[-1] = 8192)
LADDER = {"int4": (128, 512, 2048, 8192), "int8": (64, 256, 1024, 4096)}[TIER]


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("offset",))
def _gen_chunk(key, centers, offset: int):
    """-> (bf16 rows, max row norm AS STORED in bf16) — the norm rides the
    jit so no full-chunk f32 copy ever materializes (HBM is tight: the
    bf16 matrix + packed tier + generator temporaries must coexist)."""
    if MODE == "gaussian":
        rows = _normalize(jax.random.normal(key, (CHUNK, D), jnp.float32))
    else:
        cids = (offset + jnp.arange(CHUNK)) % N_CLUSTERS
        noise = _normalize(jax.random.normal(key, (CHUNK, D), jnp.float32))
        rows = _normalize(centers[cids] + LAM * noise)
    rows = rows.astype(jnp.bfloat16)
    norms = jnp.linalg.norm(rows.astype(jnp.float32), axis=1)
    return rows, jnp.max(norms)


@jax.jit
def _pack_chunk_int4(rows_bf16):
    """Mirrors EmbeddingMatrix._quantize4: per-row symmetric, scale max/7,
    lo nibble biased +8, hi nibble two's complement, TRANSPOSED."""
    f = rows_bf16.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-12) / 7.0
    q = jnp.clip(jnp.round(f / scales[:, None]), -7, 7).astype(jnp.int32)
    lo = (q[:, :D2] + 8).astype(jnp.uint8)
    hi = (q[:, D2:] & 15).astype(jnp.uint8)
    return (lo | (hi << 4)).T, scales


@jax.jit
def _pack_chunk_int8(rows_bf16):
    """Mirrors EmbeddingMatrix int8: per-row symmetric, scale max/127."""
    f = rows_bf16.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(f), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(f / scales[:, None]), -127, 127).astype(jnp.int8)
    return q, scales


def main():
    assert jax.default_backend() == "tpu"
    print(f"tier: {TIER}  mode: {MODE}  n: {N}", flush=True)
    t0 = time.time()
    centers = jax.block_until_ready(
        _normalize(jax.random.normal(jax.random.PRNGKey(99), (N_CLUSTERS, D), jnp.float32))
    )
    centers_np = np.asarray(centers)
    upd_rows = jax.jit(
        lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (i, 0)), donate_argnums=(0,)
    )
    upd_cols = jax.jit(
        lambda m, c, i: jax.lax.dynamic_update_slice(m, c, (jnp.int32(0), i)),
        donate_argnums=(0,),
    )
    matrix = jnp.zeros((N, D), jnp.bfloat16)
    if TIER == "int4":
        qmat = jnp.zeros((D2, N), jnp.uint8)
    else:
        qmat = jnp.zeros((N, D), jnp.int8)
    qscales = jnp.zeros((N,), jnp.float32)
    norm_hw = 0.0
    for j, kk in enumerate(jax.random.split(jax.random.PRNGKey(0), N // CHUNK)):
        c, mx = _gen_chunk(kk, centers, j * CHUNK)
        norm_hw = max(norm_hw, float(mx))
        off = jnp.int32(j * CHUNK)
        matrix = upd_rows(matrix, c, off)
        if TIER == "int4":
            b, sb = _pack_chunk_int4(c)
            qmat = upd_cols(qmat, b, off)
        else:
            b, sb = _pack_chunk_int8(c)
            qmat = upd_rows(qmat, b, off)
        qscales = jax.lax.dynamic_update_slice(qscales, sb, (off,))
        del c, b, sb
    jax.block_until_ready((matrix, qmat, qscales))
    src1d = jnp.zeros((N,), jnp.int32)
    src2d = src1d.reshape(1, N)
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))
    # escalation-margin ingredients (searcher._scan: scale_hw = largest
    # per-dim quantization step over rows, norm_hw = largest row norm)
    scale_hw = float(jnp.max(qscales))
    print(f"gen+pack: {time.time()-t0:.0f}s  scale_hw={scale_hw:.5f} norm_hw={norm_hw:.4f}", flush=True)

    scan = scan_topk_pallas_int4 if TIER == "int4" else scan_topk_pallas_int8

    @jax.jit
    def oracle10(q):
        ov, orows = pallas_topk_unsorted(matrix, src2d, q.astype(jnp.bfloat16), allowed, 16, False)
        _, osp = jax.lax.top_k(ov, K)
        return jnp.take_along_axis(orows, osp, axis=1)

    @jax.jit
    def rescore(q, rows):
        cand = matrix[jnp.clip(rows, 0, N - 1)]
        exact = jnp.einsum(
            "qfd,qd->qf", cand.astype(jnp.float32), q, preferred_element_type=jnp.float32
        )
        exact = jnp.where(rows >= 0, exact, -jnp.inf)
        v, perm = jax.lax.top_k(exact, exact.shape[1])
        return v, jnp.take_along_axis(rows, perm, axis=1)

    sweeps = {
        kb: jax.jit(lambda q, kb=kb: scan(qmat, qscales, src1d, q, allowed, kb))
        for kb in LADDER
    }

    rng = np.random.default_rng(7)

    def make_queries(r):
        q = rng.standard_normal((r, D)).astype(np.float32)
        if MODE != "gaussian":
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            cids = rng.integers(0, N_CLUSTERS, r)
            q = centers_np[cids] + 0.2 * q
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    def margin(q, sigmas):
        qnorm = np.linalg.norm(q, axis=1)
        qs = np.abs(q).max(axis=1) / 127.0
        return sigmas * np.sqrt((scale_hw * qnorm) ** 2 + (qs * norm_hw) ** 2) / np.sqrt(12.0)

    B = 64
    stats = {0.0: dict(hit=0, esc=0, sweeps=0), 3.0: dict(hit=0, esc=0, sweeps=0)}
    first_hit = 0
    for step in range(N_QUERIES // B):
        q_np = make_queries(B)
        q = jnp.asarray(q_np)
        orows = np.asarray(oracle10(q))
        qvals, qrows = sweeps[LADDER[0]](q)
        evals, erows = (np.asarray(x) for x in rescore(q, qrows))
        qvals = np.asarray(qvals)
        for qi in range(B):
            oset = set(orows[qi].tolist())
            first_hit += len(oset & set(erows[qi, :K].tolist()))
        for sig in (0.0, 3.0):
            marg = margin(q_np, sig)
            st = stats[sig]
            for qi in range(B):
                oset = set(orows[qi].tolist())
                ev, er, qv = evals[qi], erows[qi], qvals[qi]
                n_sweeps, li = 1, 0
                while True:
                    kth = ev[min(K, len(ev)) - 1]
                    buffer_full = np.isfinite(qv[-1])
                    if not (buffer_full and kth < qv[-1] + marg[qi]):
                        break
                    if li + 1 >= len(LADDER):
                        break
                    li += 1
                    n_sweeps += 1
                    if n_sweeps == 2:
                        st["esc"] += 1
                    qv2, qr2 = sweeps[LADDER[li]](q[qi : qi + 1])
                    ev2, er2 = rescore(q[qi : qi + 1], qr2)
                    qv, ev, er = (np.asarray(x)[0] for x in (qv2, ev2, er2))
                st["sweeps"] += n_sweeps
                st["hit"] += len(oset & set(er[:K].tolist()))
        print(f"  {(step+1)*B} queries...", flush=True)

    nq = N_QUERIES
    print(
        f"{TIER} [{MODE}] first-sweep kb={LADDER[0]}: "
        f"candidate-recall@10 {first_hit/(K*nq):.6f}",
        flush=True,
    )
    for sig in (0.0, 3.0):
        st = stats[sig]
        print(
            f"  margin {sig:.0f}-sigma: final recall@10 {st['hit']/(K*nq):.6f}  "
            f"escalation rate {st['esc']/nq:.4f}  mean sweeps {st['sweeps']/nq:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
