"""Probe: what does the exact int2 selection's FINAL big-k sort actually
cost in the composed pipeline?

probe_int2_wincut measured the window-cut alternative at +13.9 ms (the
(d, kc, 128) middle-axis XLA gather runs ~15 GB/s), which kills that
variant but leaves the underlying hypothesis untested: is the
lax.top_k(kc*128, kc) inside _select_topk_hier worth attacking at all?
This probe bounds it: the exact pipeline A/B'd against the same pipeline
with the final sort replaced by a data-dependent FAKE of the same output
shape (per-gathered-block max + iota rows — wrong results, same gather
traffic, no big-k sort).  The paired diff is an upper bound on what ANY
cheaper selection could save; if it is small, the selection alley is
closed with a number.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bench import _rand_i8t
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from perceive_tpu.ops.topk import (
    _INT2_WINDOW,
    INT2_COARSE_FETCH,
    pallas_int2_scores,
    quantize_queries,
)

R = 8
ROUNDS = 15
KC = INT2_COARSE_FETCH


def _pipeline(q, p2, sc, s1, m8, *, fake_sort: bool):
    """Inline replica of scan_int2_coarse_fine's Q=1 int8-companion path
    (kept in lockstep with ops/topk.py; a probe-only bound, not prod)."""
    n = p2.shape[1]
    nq = q.shape[0]
    qi8, qscale = quantize_queries(q)
    allowed = jnp.asarray(allowed_np)
    coarse = pallas_int2_scores(
        p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale, allowed, False, n
    )
    nw = n // _INT2_WINDOW
    outs = []
    for i in range(nq):
        sc_w = coarse[i].reshape(nw, _INT2_WINDOW)
        wmax = jnp.max(sc_w, axis=1)
        _, widx = jax.lax.top_k(wmax, KC)
        blocks = jnp.take(sc_w, widx, axis=0)
        gidx = (
            widx[:, None] * _INT2_WINDOW + jnp.arange(_INT2_WINDOW)[None, :]
        ).reshape(-1)
        if fake_sort:
            # same gather traffic, no kc*128-element sort: per-block max
            cv = jnp.max(blocks, axis=1)
            p = jnp.argmax(blocks, axis=1) + jnp.arange(KC) * _INT2_WINDOW
        else:
            cv, p = jax.lax.top_k(blocks.reshape(-1), KC)
        outs.append((cv, jnp.take(gidx, p)))
    cvals = jnp.stack([v for v, _ in outs])
    idx = jnp.stack([r for _, r in outs])
    order = jnp.argsort(idx, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    cvals = jnp.take_along_axis(cvals, order, axis=1)
    cols = jnp.take(m8, idx.reshape(-1), axis=1)
    lv = cols.reshape(-1, nq, KC)
    iscores = jnp.einsum("qd,dqk->qk", qi8, lv, preferred_element_type=jnp.int32)
    fine = iscores.astype(jnp.float32) * 0.01 * qscale
    fine = jnp.where(jnp.isfinite(cvals), fine, -jnp.inf)
    vals, perm = jax.lax.top_k(fine, K)
    rows = jnp.take_along_axis(idx, perm, axis=1)
    return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))


def main():
    assert jax.default_backend() == "tpu"
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)

    def body(fake):
        def f(q, *args):
            return _pipeline(q, *args, fake_sort=fake)
        return f

    marg = ab_interleaved_marginal(
        {
            "real_sort": (body(False), (p2, sc, s1, m8)),
            "fake_sort": (body(True), (p2, sc, s1, m8)),
        },
        queries,
        r=R,
        rounds=ROUNDS,
    )
    report(marg)
    if len(marg) == 2:
        d = np.array(marg["real_sort"]) - np.array(marg["fake_sort"])
        print(
            f"sort cost upper bound: median {np.median(d) * 1e3:+.3f} ms, "
            f"fake faster {int((d > 0).sum())}/{ROUNDS} rounds",
            flush=True,
        )


if __name__ == "__main__":
    main()
