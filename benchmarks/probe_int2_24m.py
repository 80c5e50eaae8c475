"""Spot-check the top of the int2 auto-tier range: single-query marginal
of int2 coarse-to-fine vs the int4 sweep at 24M x 384 (auto_matrix_dtype
hands int2 the 4M-24M band — this validates the 24M end isn't
extrapolation).  No oracle at this size (a bf16 copy would be 18 GB);
recall is measured at 10M by recall_int2.py."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import D, D4, D2, K, allowed_np, gen_packed
from perceive_tpu.ops.topk import (
    pallas_topk_int4_unsorted,
    quantize_queries,
    scan_int2_coarse_fine,
)

N = 24_010_752  # round_up(24M, 24576)


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    halves = [gen_packed(jax.random.PRNGKey(40 + i), D2 // 2, N) for i in range(2)]
    packed4 = jax.block_until_ready(jnp.concatenate(halves, axis=0))
    del halves
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    arrays = (packed2, scales, src, packed4, allowed)
    print("arrays resident", flush=True)

    def queries(seed, r):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def marginal(label, mk, reps=(1, 5), iters=3):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(1, r), *arrays))
            ts = []
            for i in range(iters):
                qs = queries(100 + 7 * i + r, r)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *arrays))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk_int2(r):
        def body(q, p2, sc, s1, p4, al):
            v, rows, fl = scan_int2_coarse_fine(p2, sc, p4, sc, s1, q, al, K)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return loop(r, body)

    def mk_int4(r):
        def body(q, p2, sc, s1, p4, al):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int4_unsorted(
                p4, sc.reshape(1, -1), s1.reshape(1, -1), qi8, qsc, al, K, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return loop(r, body)

    marginal("int2 coarse-to-fine @ 24M", mk_int2)
    marginal("int4 sweep @ 24M", mk_int4)


if __name__ == "__main__":
    main()
