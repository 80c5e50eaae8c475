"""Probe round 6: where do the production int2 tier's 8.42 ms go?

recall_int2.py measured the full scan_int2_coarse_fine jit at 8.42 ms
marginal for Q=1 at 10M x 384 (114 GB/s of packed bytes) — 5x the
bandwidth bound.  Phases, all in ONE process (tunnel gotchas):

  a. pallas_int2_scores alone (960 MB packed read + 40 MB score write)
  b. window-max reduce alone (40 MB score read)
  c. hier selection at kc=4096 (production int2_coarse_depth(128, 10M))
  d. hier selection at kc=2048 / 1024 / 512 (the final top_k is
     O(kc*128) sorted — is kc the knob?)
  e. full scan_int2_coarse_fine at k=128 (= recall_int2's 8.42 ms repro)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    _select_topk_hier,
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
)

N, D = 10_002_432, 384
D4, D2 = D // 4, D // 2
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)


def gen_packed(key, r, n):
    w = jax.random.bits(key, (r, n // 4), jnp.uint32)
    return jax.block_until_ready(
        jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(r, n)
    )


def marginal(label, mk, args, reps=(1, 9), iters=3):
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
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    src2d = src.reshape(1, N)
    print("arrays resident", flush=True)

    # a. coarse scores only
    def mk_a(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                sc = pallas_int2_scores(p2, sc2, s2, qi8, qsc, allowed, False)
                return acc + jnp.sum(sc[:, :: 4096])
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("a. pallas_int2_scores only", mk_a, (packed2, scales2d, src2d))

    # b. window-max reduce over a (N,) f32 row
    scores = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32))

    def mk_b(r):
        def f(qs, sc):
            def it(i, acc):
                s = sc + qs[i, 0, 0]
                w = jnp.max(s.reshape(N // 128, 128), axis=1)
                return acc + jnp.sum(w[::512])
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("b. window-max reduce only", mk_b, (scores,))

    # c/d. hier selection at several kc
    for kc in (4096, 2048, 1024, 512):
        def mk_c(r, kc=kc):
            def f(qs, sc):
                def it(i, acc):
                    s = sc + qs[i, 0, 0]
                    v, idx = _select_topk_hier(s, kc)
                    return acc + jnp.sum(v) + jnp.sum(idx.astype(jnp.float32))
                return jax.lax.fori_loop(0, r, it, 0.0)
            return f
        marginal(f"c. hier select kc={kc}", mk_c, (scores,))
    del scores

    # e. the full production program (recall_int2 repro)
    def mk_e(r):
        def f(qs, p2, s2v, p4, s4v, s1):
            def it(i, acc):
                vals, rows, floor = scan_int2_coarse_fine(
                    p2, s2v, p4, s4v, s1, qs[i], allowed, 128, engine="pallas")
                return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(floor)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("e. FULL scan_int2_coarse_fine k=128", mk_e,
             (packed2, scales, packed4, scales, src))


if __name__ == "__main__":
    main()
