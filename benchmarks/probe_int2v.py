"""Probe round 19: precise select/fine phase split (reps 2->22, 7 iters).
probe_int2u: full pipeline 2.43-2.59 ms, sweep-only@24576 1.22 ms
(roofline), tile/nosrc give nothing in composition.  So select+fine is
~1.2 ms.  Split it:

  v0. sweep only (production tile 12288)
  v1. v0 + window-max pool (reshape+max over 40 MB)
  v2. v1 + top_k(87k window maxes, 4096)            stage-1 sort
  v3. v2 + blocks gather + top_k(524k, 4096)        stage-2 sort = select done
  v4. v3 + fine phase                                = production full
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed, queries
from benchmarks.probe_int2s import fine_phase
from perceive_tpu.ops.topk import (
    _INT2_WINDOW,
    pallas_int2_scores,
    quantize_queries,
)

KC = 4096
W = _INT2_WINDOW


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

    def staged(stage):
        def mk(r):
            def body(q, p2, sc, s, p4, sc4):
                qi8, qscale = quantize_queries(q)
                coarse = pallas_int2_scores(p2, sc, s, qi8, qscale, allowed, False)
                row = coarse[0]
                if stage == 0:
                    return jnp.sum(row)
                nw = N // W
                wm = jnp.max(row.reshape(nw, W), axis=1)
                if stage == 1:
                    return jnp.sum(wm)
                wv, widx = jax.lax.top_k(wm, KC)
                if stage == 2:
                    return jnp.sum(wv) + jnp.sum(widx.astype(jnp.float32))
                blocks = jnp.take(row.reshape(nw, W), widx, axis=0)
                gidx = (widx[:, None] * W + jnp.arange(W)[None, :]).reshape(-1)
                v, p = jax.lax.top_k(blocks.reshape(-1), KC)
                idx = jnp.take(gidx, p)
                if stage == 3:
                    return jnp.sum(v) + jnp.sum(idx.astype(jnp.float32))
                vals, rows = fine_phase(
                    v[None, :], idx[None, :], qi8, qscale, p4, sc4, K)
                return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
            return loop(r, body)
        return mk

    marginal("v0. sweep only", staged(0), arrays)
    marginal("v1. + wmax pool", staged(1), arrays)
    marginal("v2. + top_k(87k, 4096)", staged(2), arrays)
    marginal("v3. + gather + top_k(524k, 4096)", staged(3), arrays)
    marginal("v4. + fine (= full)", staged(4), arrays)


if __name__ == "__main__":
    main()
