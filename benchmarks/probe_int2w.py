"""Probe round 20: the select's stage-2 (block gather + top_k(524k)) is
0.73 ms (probe_int2v).  The fine phase's column gather measured 3.7x
faster when ADDRESS-ORDERED (probe_int2g) — but the select's block
gather runs on top_k's VALUE-ordered widx.  Split gather vs sort and
price the sorted-gather fix, plus smaller windows with it.

  w0. sweep + pool + top_k(87k,4096)       (= probe_int2v v2 baseline)
  w1. w0 + UNSORTED block gather (sum only)
  w2. w0 + SORTED block gather (sum only)
  w3. w2 + top_k(524k, 4096)               (select done, sorted variant)
  w4. full pipeline w/ sorted-widx select  (vs production full)
  w5. w4 at window 64
  w6. w4 at window 32
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed, queries
from benchmarks.probe_int2s import fine_phase
from perceive_tpu.ops.topk import (
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
)

KC = 4096


def select_sorted(row, kc, w):
    """One-level hier select with an ADDRESS-ORDERED block gather."""
    n = row.shape[0]
    nw = n // w
    wmax = jnp.max(row.reshape(nw, w), axis=1)
    _, widx = jax.lax.top_k(wmax, kc)
    widx = jnp.sort(widx)  # coalesce the block gather
    blocks = jnp.take(row.reshape(nw, w), widx, axis=0)
    v, p = jax.lax.top_k(blocks.reshape(-1), kc)
    idx = jnp.take(widx, p // w) * w + p % w
    return v, idx


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    scales4 = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    arrays = (packed2, scales2d, src2d, packed4, scales4)
    print("arrays resident", flush=True)

    # set-check sorted select vs production
    q0 = queries(7, 1)[0]
    v0, r0, _ = jax.jit(
        lambda q, p2, sc, s, p4, sc4: scan_int2_coarse_fine(
            p2, sc[0], p4, sc4, s[0], q, allowed, K)
    )(q0, *arrays)

    def full_sorted(w):
        def f(q, p2, sc, s, p4, sc4):
            qi8, qscale = quantize_queries(q)
            coarse = pallas_int2_scores(p2, sc, s, qi8, qscale, allowed, False)
            v, idx = select_sorted(coarse[0], KC, w)
            return fine_phase(v[None, :], idx[None, :], qi8, qscale, p4, sc4, K)
        return f

    for w in (128, 64, 32):
        v1, r1 = jax.jit(full_sorted(w))(q0, *arrays)
        assert set(np.asarray(r1[0]).tolist()) == set(np.asarray(r0[0]).tolist()), w
    print("set-checks OK", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def marginal(label, mk, args, reps=(2, 22), iters=7):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(1, r), *args))
            ts = []
            for i in range(iters):
                qs = queries(100 + 7 * i + r, r)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *args))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms", flush=True)
        return marg

    def staged(stage, w=128, sort=True):
        def mk(r):
            def body(q, p2, sc, s, p4, sc4):
                qi8, qscale = quantize_queries(q)
                coarse = pallas_int2_scores(p2, sc, s, qi8, qscale, allowed, False)
                row = coarse[0]
                nw = N // w
                wmax = jnp.max(row.reshape(nw, w), axis=1)
                wv, widx = jax.lax.top_k(wmax, KC)
                if stage == 0:
                    return jnp.sum(wv) + jnp.sum(widx.astype(jnp.float32))
                if sort:
                    widx = jnp.sort(widx)
                blocks = jnp.take(row.reshape(nw, w), widx, axis=0)
                if stage == 1:
                    return jnp.sum(blocks)
                v, p = jax.lax.top_k(blocks.reshape(-1), KC)
                idx = jnp.take(widx, p // w) * w + p % w
                if stage == 2:
                    return jnp.sum(v) + jnp.sum(idx.astype(jnp.float32))
                vals, rows = fine_phase(
                    v[None, :], idx[None, :], qi8, qscale, p4, sc4, K)
                return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
            return loop(r, body)
        return mk

    marginal("w0. thru top_k(87k,4096)", staged(0), arrays)
    marginal("w1. + UNSORTED gather", staged(1, sort=False), arrays)
    marginal("w2. + SORTED gather", staged(1, sort=True), arrays)
    marginal("w3. w2 + top_k(524k)", staged(2, sort=True), arrays)
    marginal("w4. full sorted select", staged(3, sort=True), arrays)
    marginal("w5. full sorted select w=64", staged(3, w=64), arrays)
    marginal("w6. full sorted select w=32", staged(3, w=32), arrays)


if __name__ == "__main__":
    main()
