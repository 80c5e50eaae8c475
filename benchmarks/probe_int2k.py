"""Probe round 10: why was the OLD row-granular int2 pipeline 7.1 ms when
its parts sum to 3.0?  Two suspects: (a) the (Q, N) score buffer's layout
re-tiling, (b) the fine gather's SCORE-ORDERED (i.e. random) column order
(probe_int2g measured a SORTED idx gather at 0.14 ms).

  k1. scores kernel -> hier select 4096 (no fine phase)
  k2. k1 + UNSORTED scattered int4 column gather + rescore  (old pipeline)
  k3. k1 + SORTED   scattered int4 column gather + rescore  (the fix?)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    _select_topk_hier,
    pallas_int2_scores,
    quantize_queries,
    unpack_int4_xla,
)

N, D = 10_002_432, 384
D4, D2 = D // 4, D // 2
KC, K = 4096, 128
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)


def gen_packed(key, r, n):
    w = jax.random.bits(key, (r, n // 4), jnp.uint32)
    return jax.block_until_ready(
        jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(r, n)
    )


def marginal(label, mk, args, reps=(1, 5), iters=3):
    walls = {}
    for r in reps:
        fn = jax.jit(mk(r))

        def queries(seed):
            q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
            return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

        np.asarray(fn(queries(1), *args))
        ts = []
        for i in range(iters):
            qs = queries(100 + 7 * i + r)
            t0 = time.perf_counter()
            np.asarray(fn(qs, *args))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
    print(f"{label}: {marg*1e3:.3f} ms  (wall1 {walls[reps[0]]*1e3:.1f} ms)", flush=True)
    return marg


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    scales2d = scales.reshape(1, N)
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print("arrays resident", flush=True)

    # NB: big arrays must flow through jit ARGUMENTS, not closures —
    # closed-over globals become jaxpr constants that XLA constant-folds
    # at compile time (the original version of this probe hung for hours).
    def coarse_select(q, p2):
        qi8, qsc = quantize_queries(q)
        sc = pallas_int2_scores(p2, scales2d, src2d, qi8, qsc, allowed, False)
        cv, idx = jax.vmap(lambda s: _select_topk_hier(s, KC))(sc)
        return qi8, qsc, cv, idx

    def mk_k1(r):
        def f(qs, p2):
            def it(i, acc):
                _, _, cv, idx = coarse_select(qs[i], p2)
                return acc + jnp.sum(cv) + jnp.sum(idx.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("k1. scores -> hier select 4096", mk_k1, (packed2,))

    def fine(qi8, qsc, cv, idx, p4, s1):
        cols = jnp.take(p4, idx.reshape(-1), axis=1)
        lv = unpack_int4_xla(cols).reshape(-1, 1, KC)
        isc = jnp.einsum("qd,dqk->qk", qi8, lv, preferred_element_type=jnp.int32)
        fs = isc.astype(jnp.float32) * jnp.take(s1, idx) * qsc
        fs = jnp.where(jnp.isfinite(cv), fs, -jnp.inf)
        v, p = jax.lax.top_k(fs, K)
        return v, jnp.take_along_axis(idx, p, axis=1)

    def mk_k2(r):
        def f(qs, p2, p4, s1):
            def it(i, acc):
                qi8, qsc, cv, idx = coarse_select(qs[i], p2)
                v, rw = fine(qi8, qsc, cv, idx, p4, s1)
                return acc + jnp.sum(v) + jnp.sum(rw.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("k2. + UNSORTED fine gather (old)", mk_k2, (packed2, packed4, scales))

    def mk_k3(r):
        def f(qs, p2, p4, s1):
            def it(i, acc):
                qi8, qsc, cv, idx = coarse_select(qs[i], p2)
                sidx = jnp.sort(idx, axis=1)  # address-ordered gather
                v, rw = fine(qi8, qsc, jnp.zeros_like(cv), sidx, p4, s1)
                return acc + jnp.sum(v) + jnp.sum(rw.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("k3. + SORTED fine gather", mk_k3, (packed2, packed4, scales))


if __name__ == "__main__":
    main()
