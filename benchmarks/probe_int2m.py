"""Probe round 12: localize the int2 composition cost with CUMULATIVE
stages (each program = previous + one stage), all fed by the real Pallas
score output, arrays threaded through jit args (NOT closures — see
probe_int2h note).  Suspect: _select_topk_hier's final lax.top_k over
kc*128 = 524,288 f32 with k=4096 (big-k top_k sorts).

  m1. scores -> sum                                  (baseline read)
  m2. scores -> wmax -> topk(4096 windows) -> sum    (first big-k top_k)
  m3. m2 + block gather + FINAL topk(4096 of 524k)   (= full hier select)
  m4. scores -> approx_max_k(4096) -> sum            (PartialReduce select)
  m5. m3 variant: final select via approx_max_k      (hybrid)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    _INT2_WINDOW,
    pallas_int2_scores,
    quantize_queries,
)

N, D = 10_002_432, 384
D4 = D // 4
KC = 4096
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
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print("arrays resident", flush=True)

    def coarse(q, p2, sc2, s2):
        qi8, qsc = quantize_queries(q)
        return pallas_int2_scores(p2, sc2, s2, qi8, qsc, allowed, False)[0]

    def loop(r, body):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                return acc + body(coarse(qs[i], p2, sc2, s2))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    nw = N // _INT2_WINDOW

    def mk_m1(r):
        return loop(r, lambda sc: jnp.sum(sc[::4111]))
    marginal("m1. scores -> strided sum", mk_m1, (packed2, scales2d, src2d))

    def wtop(sc):
        wmax = jnp.max(sc.reshape(nw, _INT2_WINDOW), axis=1)
        return jax.lax.top_k(wmax, KC)

    def mk_m2(r):
        def body(sc):
            wv, widx = wtop(sc)
            return jnp.sum(wv) + jnp.sum(widx.astype(jnp.float32))
        return loop(r, body)
    marginal("m2. + wmax + topk(4096 windows)", mk_m2, (packed2, scales2d, src2d))

    def mk_m3(r):
        def body(sc):
            _, widx = wtop(sc)
            blocks = jnp.take(sc.reshape(nw, _INT2_WINDOW), widx, axis=0)
            v, p = jax.lax.top_k(blocks.reshape(-1), KC)
            return jnp.sum(v) + jnp.sum(p.astype(jnp.float32))
        return loop(r, body)
    marginal("m3. + block gather + FINAL topk(4096 of 524k)", mk_m3, (packed2, scales2d, src2d))

    def mk_m4(r):
        def body(sc):
            v, idx = jax.lax.approx_max_k(sc, KC, recall_target=0.99)
            return jnp.sum(v) + jnp.sum(idx.astype(jnp.float32))
        return loop(r, body)
    marginal("m4. scores -> approx_max_k(4096, r=.99)", mk_m4, (packed2, scales2d, src2d))

    def mk_m5(r):
        def body(sc):
            _, widx = wtop(sc)
            blocks = jnp.take(sc.reshape(nw, _INT2_WINDOW), widx, axis=0)
            v, p = jax.lax.approx_max_k(blocks.reshape(-1), KC, recall_target=0.99)
            return jnp.sum(v) + jnp.sum(p.astype(jnp.float32))
        return loop(r, body)
    marginal("m5. hier select w/ approx FINAL", mk_m5, (packed2, scales2d, src2d))


if __name__ == "__main__":
    main()
