"""TRUE device sweep times through the tunnel.

The serving tunnel adds ~45 ms per dispatch round trip (a trivial multiply
measures the same wall as a 7.7 GB sweep), so single-call walls are
meaningless.  Method: run the kernel K times inside ONE jit (fori_loop over
distinct query slices, accumulate the outputs so nothing elides) and take
marginal = (wall_K - wall_1) / (K - 1).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    pallas_topk_int4_unsorted,
    pallas_topk_int8_unsorted,
    pallas_topk_unsorted,
    quantize_queries,
)

N, D = 10_002_432, 384
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)
rng = np.random.default_rng(0)


def qbatch(k):
    q = rng.standard_normal((k, 1, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=2, keepdims=True)
    return jax.block_until_ready(jnp.asarray(q))


def time_repeat(name, fn_for_k, extra_args, reps=(1, 9)):
    walls = {}
    try:
        for k in reps:
            fn = jax.jit(fn_for_k(k))
            np.asarray(fn(qbatch(k), *extra_args))
            ts = []
            for _ in range(5):
                qs = qbatch(k)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *extra_args))
                ts.append(time.perf_counter() - t0)
            walls[k] = float(np.median(ts))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    marg = (walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0])
    print(
        f"{name}: wall1={walls[reps[0]]*1e3:.1f}ms wall{reps[1]}={walls[reps[1]]*1e3:.1f}ms"
        f" -> marginal {marg*1e3:.2f} ms/sweep",
        flush=True,
    )
    return marg


def _gen_int8_rowmajor():
    """(N, 384) int8 generated in row halves to bound HBM peak."""
    halves = []
    for i in range(2):
        w = jax.random.bits(jax.random.PRNGKey(2 + i), (N // 2, D // 4), jnp.uint32)
        halves.append(jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(N // 2, D))
        del w
    m = jnp.concatenate(halves, axis=0)
    del halves
    return jax.block_until_ready(jax.lax.bitcast_convert_type(m, jnp.int8))


def main(which: str):
    print("backend:", jax.default_backend(), "dtype:", which, flush=True)
    allowed = jnp.asarray(allowed_np)
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))

    if which == "bf16":
        matrix = jax.block_until_ready(
            jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16)
        )

        def fn(k):
            def f(qs, m, s2):
                def it(i, acc):
                    v, r = pallas_topk_unsorted(m, s2, qs[i].astype(jnp.bfloat16), allowed, 16, False)
                    return acc + jnp.sum(v) + jnp.sum(r.astype(jnp.float32))
                return jax.lax.fori_loop(0, k, it, 0.0)
            return f

        time_repeat("bf16 (N,384)", fn, (matrix, src2d), reps=(1, 9))
    elif which == "int8":
        m8 = _gen_int8_rowmajor()

        def fn(k):
            def f(qs, m, s2, sc2):
                def it(i, acc):
                    qi8, qsc = quantize_queries(qs[i])
                    v, r = pallas_topk_int8_unsorted(m, sc2, s2, qi8, qsc, allowed, 16, False)
                    return acc + jnp.sum(v) + jnp.sum(r.astype(jnp.float32))
                return jax.lax.fori_loop(0, k, it, 0.0)
            return f

        time_repeat("int8 (N,384)", fn, (m8, src2d, scales2d), reps=(1, 17))
    elif which == "int4":
        w4 = jax.random.bits(jax.random.PRNGKey(3), (D // 2, N // 4), jnp.uint32)
        p4 = jax.block_until_ready(jax.lax.bitcast_convert_type(w4, jnp.uint8).reshape(D // 2, N))
        del w4

        def fn(k):
            def f(qs, m, s2, sc2):
                def it(i, acc):
                    qi8, qsc = quantize_queries(qs[i])
                    v, r = pallas_topk_int4_unsorted(m, sc2, s2, qi8, qsc, allowed, 16, False)
                    return acc + jnp.sum(v) + jnp.sum(r.astype(jnp.float32))
                return jax.lax.fori_loop(0, k, it, 0.0)
            return f

        time_repeat("int4 (D/2,N)", fn, (p4, src2d, scales2d), reps=(1, 17))


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "bf16")
