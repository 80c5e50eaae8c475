"""Probe round 4.1: approx_max_k (the TPU PartialReduce custom call) as
the int2 coarse selection.

Round 3 closed the "selection-sort alley" for SORT-based extractions
(threshold +0.14, bisection +0.64, window-cut +6..14 ms) and rejected
approx_max_k on floor-soundness grounds (topk.py section comment).  But
soundness is recoverable for ~one cheap pass: floor = min(approx vals),
then ONE O(N)-read reduction `count = sum(coarse >= floor)`; count == kc
proves every row above the floor was fetched (the approx set is then
top-kc-EXACT as a set), and a lax.cond falls back to the exact
hierarchical select otherwise.  If PartialReduce beats the two-top_k
hierarchical select by more than the count pass costs, the 0.48 ms sort
(probe_int2_sortcost) finally pays out.

Cases (full pipeline, only the selection differs, fine_bits=8 like the
production 10M tier):

  exact          production scan_int2_coarse_fine (select="exact")
  approx95       approx_max_k(coarse, kc) rt=0.95, no soundness pass
  approx_sound   approx95 + count pass + lax.cond exact fallback
  hybrid         wmax pool + top_k windows + gather + approx_max_k(524k)

plus isolated select-only costs on a resident random score row:
top_k(87k wmax path), approx_max_k(10M), count-pass(10M).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
from perceive_tpu.ops.topk import (
    _INT2_WINDOW,
    INT2_COARSE_FETCH,
    _select_topk_hier,
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
)

R = 8
ROUNDS = 15
KC = INT2_COARSE_FETCH


def _fine_phase(coarse_vals, idx, m8, sc_fine, qi8_row, qscale_row):
    """Address-ordered int8-companion rescore of one query's candidates
    (lockstep with scan_int2_coarse_fine's fine pass, fine_bits=8)."""
    order = jnp.argsort(idx)
    idx = jnp.take(idx, order)
    cvals = jnp.take(coarse_vals, order)
    cols = jnp.take(m8, idx, axis=1)  # (D, KC) int8
    iscores = jnp.einsum(
        "d,dk->k", qi8_row, cols, preferred_element_type=jnp.int32
    )
    fine = iscores.astype(jnp.float32) * jnp.take(sc_fine, idx) * qscale_row
    fine = jnp.where(jnp.isfinite(cvals), fine, -jnp.inf)
    vals, perm = jax.lax.top_k(fine, K)
    rows = jnp.take(idx, perm)
    return vals, rows


def _coarse(q, p2, sc, s1, allowed):
    n = p2.shape[1]
    qi8, qscale = quantize_queries(q)
    coarse = pallas_int2_scores(
        p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale, allowed, False, n
    )
    return coarse, qi8, qscale


def body_exact(q, p2, sc, s1, m8, allowed):
    v, rows, fl = scan_int2_coarse_fine(
        p2, sc, m8, sc, s1, q, allowed, K, fine_bits=8, select="exact"
    )
    return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)


def make_approx(recall_target, sound):
    def body(q, p2, sc, s1, m8, allowed):
        coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
        row = coarse[0]
        avals, aidx = jax.lax.approx_max_k(row, KC, recall_target=recall_target)
        if sound:
            floor = jnp.min(avals)
            count = jnp.sum((row >= floor).astype(jnp.int32))

            def exact_sel(_):
                return _select_topk_hier(row, KC)

            def keep(_):
                return avals, aidx

            avals, aidx = jax.lax.cond(count == KC, keep, exact_sel, None)
        v, rows = _fine_phase(avals, aidx, m8, sc, qi8[0], qscale[0, 0])
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

    return body


def body_hybrid(q, p2, sc, s1, m8, allowed):
    coarse, qi8, qscale = _coarse(q, p2, sc, s1, allowed)
    row = coarse[0]
    n = row.shape[0]
    nw = n // _INT2_WINDOW
    sc_w = row.reshape(nw, _INT2_WINDOW)
    wmax = jnp.max(sc_w, axis=1)
    _, widx = jax.lax.top_k(wmax, KC)
    blocks = jnp.take(sc_w, widx, axis=0)
    gidx = (
        widx[:, None] * _INT2_WINDOW + jnp.arange(_INT2_WINDOW)[None, :]
    ).reshape(-1)
    avals, p = jax.lax.approx_max_k(blocks.reshape(-1), KC, recall_target=0.95)
    aidx = jnp.take(gidx, p)
    v, rows = _fine_phase(avals, aidx, m8, sc, qi8[0], qscale[0, 0])
    return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))


def isolated(scores):
    """Select-only micro-costs on a resident (N,) f32 row; the q argument
    perturbs element 0 so the tunnel can't memoize."""

    def sel_exact(q, s):
        s = s.at[0].set(q[0, 0])
        v, i = _select_topk_hier(s, KC)
        return jnp.sum(v) + jnp.sum(i.astype(jnp.float32))

    def sel_approx(q, s):
        s = s.at[0].set(q[0, 0])
        v, i = jax.lax.approx_max_k(s, KC, recall_target=0.95)
        return jnp.sum(v) + jnp.sum(i.astype(jnp.float32))

    def count_pass(q, s):
        s = s.at[0].set(q[0, 0])
        return jnp.sum((s >= q[0, 1]).astype(jnp.int32)).astype(jnp.float32)

    return {
        "sel_exact": (sel_exact, (scores,)),
        "sel_approx": (sel_approx, (scores,)),
        "count_pass": (count_pass, (scores,)),
    }


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)

    # correctness spot-check on a small prefix: the sound variant must be
    # set-identical to exact when count==kc (it proves it), and the fine
    # phase must rank identically
    q0 = queries(7, 1)[0]
    v_e, r_e, _ = scan_int2_coarse_fine(
        p2[:, :196608], sc[:196608], m8[:, :196608], sc[:196608],
        s1[:196608], q0, allowed, K, fine_bits=8, select="exact"
    )
    coarse, qi8, qsc = _coarse(q0, p2[:, :196608], sc[:196608], s1[:196608], allowed)
    av, ai = jax.lax.approx_max_k(coarse[0], KC, recall_target=0.95)
    floor = jnp.min(av)
    count = int(jnp.sum((coarse[0] >= floor).astype(jnp.int32)))
    v_a, r_a = _fine_phase(av, ai, m8[:, :196608], sc[:196608], qi8[0], qsc[0, 0])
    agree = len(np.intersect1d(np.asarray(r_e[0]), np.asarray(r_a))) / K
    print(f"small-prefix: count=={count} (kc={KC}), top-{K} set agree {agree:.4f}",
          flush=True)

    marg = ab_interleaved_marginal(
        {
            "exact": (body_exact, (p2, sc, s1, m8, allowed)),
            "approx95": (make_approx(0.95, False), (p2, sc, s1, m8, allowed)),
            "approx_snd": (make_approx(0.95, True), (p2, sc, s1, m8, allowed)),
            "hybrid": (body_hybrid, (p2, sc, s1, m8, allowed)),
        },
        queries,
        r=R,
        rounds=ROUNDS,
    )
    report(marg)
    if "exact" in marg and "approx_snd" in marg:
        d = np.array(marg["exact"]) - np.array(marg["approx_snd"])
        print(
            f"approx_sound saves: median {np.median(d)*1e3:+.3f} ms, "
            f"wins {int((d > 0).sum())}/{ROUNDS}",
            flush=True,
        )

    scores = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(5), (N,), jnp.float32)
    )
    iso = ab_interleaved_marginal(isolated(scores), queries, r=R, rounds=8)
    report(iso)


if __name__ == "__main__":
    main()
