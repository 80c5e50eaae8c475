"""Probe round 17: the int2-coarse vs int4-fine-sweep CROSSOVER in Q.

The coarse path costs sweep(0.96 GB, Q-flat) + Q * (select + fine
gather) — linear in Q.  The int4 fine sweep costs sweep(1.92 GB,
~Q-flat at small Q).  searcher._INT2_MAX_Q routes between them and was
set to 8 before the unrolled select made per-query cost visible;
measure both at Q = 1, 2, 3, 4, 8 (marginal over batch repeats)."""

import jax
import jax.numpy as jnp
import numpy as np
import time

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed
from perceive_tpu.ops.topk import (
    pallas_topk_int4_unsorted,
    quantize_queries,
    scan_int2_coarse_fine,
)


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

    def queries(seed, r, qn):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, qn, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def marginal(label, mk, qn, reps=(1, 5), iters=3):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(1, r, qn), packed2, scales, src, packed4))
            ts = []
            for i in range(iters):
                qs = queries(100 + 7 * i + r, r, qn)
                t0 = time.perf_counter()
                np.asarray(fn(qs, packed2, scales, src, packed4))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms/batch ({marg*1e3/qn:.3f} ms/q)", flush=True)
        return marg

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk_int2(r):
        def body(q, p2, sc, s1, p4):
            v, rows, fl = scan_int2_coarse_fine(p2, sc, p4, sc, s1, q, allowed, K)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return loop(r, body)

    def mk_int4(r):
        def body(q, p2, sc, s1, p4):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int4_unsorted(
                p4, scales2d, src2d, qi8, qsc, allowed, K, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return loop(r, body)

    for qn in (1, 2, 3, 4, 8):
        marginal(f"int2 coarse-to-fine Q={qn}", mk_int2, qn)
        marginal(f"int4 fine sweep     Q={qn}", mk_int4, qn)


if __name__ == "__main__":
    main()
