"""Probe round 8: the int2 pieces are cheap in isolation (coarse 1.86,
select 0.64, fine-from-idx 0.52) but the composed program is 7.1 ms.
Hypothesis: the (1, N) f32 Pallas score output relayouts when reshaped
to (N/128, 128) for the window reduce.  Phases:

  i1. pallas_int2_scores -> _select_topk_hier(kc=4096)   (no fine phase)
  i2. pallas_int2_scores -> reshape + window-max only
  i3. pallas_int2_scores -> flat lax.top_k(kc=4096)      (the sort we avoided)
  i4. wmax-in-XLA from the (1,N) scores, top_k windows, NO row gather
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
)

N, D = 10_002_432, 384
D4 = D // 4
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

    # NB: thread the big arrays through the jit ARGUMENTS — closing over
    # the globals embeds them as jaxpr constants and XLA constant-folds
    # the whole 10M scan at compile time (hours).  This bug is why the
    # first runs of this probe hung.
    def coarse(q, p2, sc2, s2):
        qi8, qsc = quantize_queries(q)
        return pallas_int2_scores(p2, sc2, s2, qi8, qsc, allowed, False)

    def mk_i1(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                sc = coarse(qs[i], p2, sc2, s2)
                v, idx = jax.vmap(lambda s: _select_topk_hier(s, 4096))(sc)
                return acc + jnp.sum(v) + jnp.sum(idx.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("i1. coarse -> hier select kc=4096", mk_i1, (packed2, scales2d, src2d))

    def mk_i2(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                sc = coarse(qs[i], p2, sc2, s2)
                w = jnp.max(sc.reshape(1, N // 128, 128), axis=2)
                return acc + jnp.sum(w[:, ::512])
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("i2. coarse -> window-max only", mk_i2, (packed2, scales2d, src2d))

    def mk_i4(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                sc = coarse(qs[i], p2, sc2, s2)
                w = jnp.max(sc.reshape(1, N // 128, 128), axis=2)
                wv, widx = jax.lax.top_k(w, 2048)
                return acc + jnp.sum(wv) + jnp.sum(widx.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("i4. coarse -> wmax -> top_k 2048 windows", mk_i4, (packed2, scales2d, src2d))


if __name__ == "__main__":
    main()
