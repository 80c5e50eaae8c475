"""Probe round 11: the production scan_int2_coarse_fine after the
address-ordered fine gather (ops/topk.py argsort before jnp.take).
Directly comparable to probe_int2i's j3 = 7.10 ms on the same shapes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    scan_int2_coarse_fine,
)

N, D = 10_002_432, 384
D4, D2 = D // 4, D // 2
K = 128
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
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)

    def mk_full(r):
        def f(qs, p2, s2, p4, s4, sid):
            def it(i, acc):
                v, rows, fl = scan_int2_coarse_fine(
                    p2, s2, p4, s4, sid, qs[i], allowed, K
                )
                return acc + jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    marginal(
        "FULL scan_int2_coarse_fine k=128 (sorted fine gather)",
        mk_full,
        (packed2, scales, packed4, scales, src),
    )


if __name__ == "__main__":
    main()
