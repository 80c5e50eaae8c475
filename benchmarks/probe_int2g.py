"""Probe round 7: the int2 FINE phase hides ~4.6 ms (probe_int2f: full
7.10 ms vs coarse 1.86 + select 0.64).  Break the fine phase down, with
idx = kc random candidate rows as a fixed input:

  f1. column gather: jnp.take(packed4 (D/2, N), idx, axis=1)
  f2. row gather from a row-major copy: take(packed4_rm (N, D/2), axis=0)
  f3. row gather from a 256-padded row-major copy (aligned rows)
  g.  rescore given gathered cols resident (unpack + einsum + scales + top_k)
  h.  full fine phase from idx (gather + rescore)

All marginal-method in one process, Q=1, kc=4096, k=128.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.ops.topk import quantize_queries, unpack_int4_xla

N, D = 10_002_432, 384
D2 = D // 2
KC, K = 4096, 128


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
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    idx_np = np.sort(np.random.default_rng(0).choice(N, KC, replace=False)).astype(np.int32)
    idx = jax.block_until_ready(jnp.asarray(idx_np))
    print("arrays resident", flush=True)

    # f1. transposed column gather (the production path)
    def mk_f1(r):
        def f(qs, p4, ix):
            def it(i, acc):
                ix2 = (ix + i) % N  # vary to defeat CSE across the loop
                cols = jnp.take(p4, ix2, axis=1)  # (D/2, KC)
                return acc + jnp.sum(cols[::7, ::13].astype(jnp.float32)) + qs[i, 0, 0]
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("f1. column gather (D/2,N) take axis=1", mk_f1, (packed4, idx))

    # g. rescore given gathered cols resident
    cols0 = jax.block_until_ready(jnp.take(packed4, idx, axis=1))

    def mk_g(r):
        def f(qs, c, s4, ix):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                lv = unpack_int4_xla(c).reshape(-1, 1, KC)
                isc = jnp.einsum("qd,dqk->qk", qi8, lv,
                                 preferred_element_type=jnp.int32)
                fine = isc.astype(jnp.float32) * jnp.take(s4, ix) * qsc
                v, p = jax.lax.top_k(fine, K)
                return acc + jnp.sum(v) + jnp.sum(p.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("g.  rescore only (unpack+einsum+topk)", mk_g, (cols0, scales, idx))

    # h. full fine phase from idx
    def mk_h(r):
        def f(qs, p4, s4, ix):
            def it(i, acc):
                ix2 = (ix + i) % N
                qi8, qsc = quantize_queries(qs[i])
                cols = jnp.take(p4, ix2, axis=1)
                lv = unpack_int4_xla(cols).reshape(-1, 1, KC)
                isc = jnp.einsum("qd,dqk->qk", qi8, lv,
                                 preferred_element_type=jnp.int32)
                fine = isc.astype(jnp.float32) * jnp.take(s4, ix2) * qsc
                v, p = jax.lax.top_k(fine, K)
                return acc + jnp.sum(v) + jnp.sum(p.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("h.  fine phase from idx", mk_h, (packed4, scales, idx))
    del cols0

    # f2/f3: row-major gathers
    packed4_rm = jax.block_until_ready(packed4.T.copy())
    del packed4

    def mk_f2(r):
        def f(qs, p4, ix):
            def it(i, acc):
                ix2 = (ix + i) % N
                rws = jnp.take(p4, ix2, axis=0)  # (KC, D/2)
                return acc + jnp.sum(rws[::13, ::7].astype(jnp.float32)) + qs[i, 0, 0]
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("f2. row gather (N,D/2) take axis=0", mk_f2, (packed4_rm, idx))

    padded = jax.block_until_ready(
        jnp.pad(packed4_rm, ((0, 0), (0, 256 - D2))))
    del packed4_rm
    marginal("f3. row gather (N,256) aligned", mk_f2, (padded, idx))


if __name__ == "__main__":
    main()
