"""Round 5.1 (VERDICT r4 #1): decompose the ~0.9 ms fixed post-sweep cost
of the production int2 coarse-to-fine pipeline at 10M x 384.

Round 4 isolated select_approx at 0.33 ms and attributed the remaining
~0.5 ms to "gather/fine-rescore/glue" without a per-stage decomposition.
This probe measures cumulative prefixes of the EXACT production pipeline
(scan_int2_coarse_fine, select="approx", fine_bits=8, kc=4096) plus two
candidate glue trims, all A/B-interleaved in one process:

  sweep        pallas int2 score kernel only (the HBM-bound floor)
  sweep_sel    + per-query approx_max_k(kc)            [select cost]
  sweep_gat    + argsort address-order + column gather [gather cost]
  prod         full production scan_int2_coarse_fine   [einsum+topk+glue]
  nosort       prod minus the argsort address-ordering (gather in
               score order: is the isolated 0.14-vs-0.52 ms win real
               in composition, or is argsort+2x take_along_axis a wash?)
  fineapx      prod with the final exact top_k(fine, K) replaced by
               approx_max_k(fine, K) over the 4096 candidates

Deltas between consecutive rows attribute the post-sweep budget; any
variant beating prod by >0.1 ms robustly is a shipping candidate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
from perceive_tpu.ops.topk import (
    INT2_COARSE_FETCH,
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
)

KC = INT2_COARSE_FETCH  # 4096


def _coarse(q, p2, sc, s1, allowed):
    n = p2.shape[1]
    qi8, qscale = quantize_queries(q)
    coarse = pallas_int2_scores(
        p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale, allowed, False, n
    )
    return coarse, qi8, qscale


def body_sweep(q, p2, sc, s1, m8, allowed):
    coarse, _, _ = _coarse(q, p2, sc, s1, allowed)
    return jnp.sum(coarse[:, :128])


def body_sweep_sel(q, p2, sc, s1, m8, allowed):
    coarse, _, _ = _coarse(q, p2, sc, s1, allowed)
    v, i = jax.lax.approx_max_k(coarse[0], KC, recall_target=0.98)
    return jnp.sum(v[:16]) + jnp.sum(i[:16].astype(jnp.float32))


def body_sweep_gat(q, p2, sc, s1, m8, allowed):
    coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
    v, idx = jax.lax.approx_max_k(coarse[0], KC, recall_target=0.98)
    order = jnp.argsort(idx)
    idx = jnp.take(idx, order)
    cols = jnp.take(m8, idx, axis=1)  # (D, KC) int8
    return jnp.sum(cols.astype(jnp.int32)) + jnp.sum(v)


def body_prod(q, p2, sc, s1, m8, allowed):
    v, rows, fl = scan_int2_coarse_fine(
        p2, sc, m8, sc, s1, q, allowed, K, fine_bits=8, select="approx"
    )
    return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)


def _fine(idx, cvals, m8, sc_fine, qi8, qscale, kf):
    cols = jnp.take(m8, idx, axis=1)
    iscores = jnp.einsum(
        "d,dk->k", qi8[0], cols, preferred_element_type=jnp.int32
    )
    fine = iscores.astype(jnp.float32) * jnp.take(sc_fine, idx) * qscale[0, 0]
    fine = jnp.where(jnp.isfinite(cvals), fine, -jnp.inf)
    return fine


def body_nosort(q, p2, sc, s1, m8, allowed):
    coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
    cvals, idx = jax.lax.approx_max_k(coarse[0], KC, recall_target=0.98)
    fine = _fine(idx, cvals, m8, sc, qi8, qscale, K)
    vals, perm = jax.lax.top_k(fine, K)
    rows = jnp.take(idx, perm)
    return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + cvals[-1]


def body_fineapx(q, p2, sc, s1, m8, allowed):
    coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
    cvals, idx = jax.lax.approx_max_k(coarse[0], KC, recall_target=0.98)
    order = jnp.argsort(idx)
    idx = jnp.take(idx, order)
    cvals = jnp.take(cvals, order)
    fine = _fine(idx, cvals, m8, sc, qi8, qscale, K)
    vals, perm = jax.lax.approx_max_k(fine, K, recall_target=0.98)
    rows = jnp.take(idx, perm)
    return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + cvals[-1]


def make_rt(rt):
    """nosort-pipeline variant at a different PartialReduce recall_target
    (buffer ~3.1k/(1-rt): rt .98 -> 313k sorted by the custom call's
    aggregation; .95 halves it, .90 quarters — latency-only probe, recall
    gate separately if one wins)."""

    def body(q, p2, sc, s1, m8, allowed):
        coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
        cvals, idx = jax.lax.approx_max_k(coarse[0], KC, recall_target=rt)
        fine = _fine(idx, cvals, m8, sc, qi8, qscale, K)
        vals, perm = jax.lax.top_k(fine, K)
        rows = jnp.take(idx, perm)
        return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + cvals[-1]

    return body


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)
    marg = ab_interleaved_marginal(
        {
            "sweep": (body_sweep, (p2, sc, s1, m8, allowed)),
            "sweep_sel": (body_sweep_sel, (p2, sc, s1, m8, allowed)),
            "sweep_gat": (body_sweep_gat, (p2, sc, s1, m8, allowed)),
            "prod": (body_prod, (p2, sc, s1, m8, allowed)),
            "nosort": (body_nosort, (p2, sc, s1, m8, allowed)),
            "fineapx": (body_fineapx, (p2, sc, s1, m8, allowed)),
            "rt95": (make_rt(0.95), (p2, sc, s1, m8, allowed)),
            "rt90": (make_rt(0.90), (p2, sc, s1, m8, allowed)),
        },
        queries, r=8, rounds=15,
    )
    report(marg)


if __name__ == "__main__":
    main()
