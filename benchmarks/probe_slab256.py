"""Probe round 4: QUERY_SLAB 256 (and 512-query flat grouping) for the
slabbed kernel.

Prior results (Q=2048, 10Mx384 bf16, k=10): base(slab 128) 140.05 ms,
dot+max floor 81.62 (MXU peak), skip-write 153.73, ping-pong 137.99,
lazy-rescore 203.94.  All data-dependent-branch variants lose; the merge
cost looks like fixed per-instance overhead (while_loop + scheduling
barrier), so halving the instance count by doubling the slab height is
the remaining lever: scratch (256, 4096) f32 = 4 MB still fits VMEM
(m 2x3.1 + q 1.5 + 4 = 11.9 MB < 14).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import perceive_tpu.ops.topk as topk

N, D, Q, K = 10_002_432, 384, 2048, 10


def marginal(fn, matrix, src2d, allowed, reps=(1, 3), iters=3):
    def queries(seed, r):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, Q, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def make(r):
        def f(qs, m, s2):
            def it(i, acc):
                out = fn(m, s2, qs[i].astype(m.dtype), allowed)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return jax.jit(f)

    walls = {}
    for r in reps:
        jf = make(r)
        np.asarray(jf(queries(1, r), matrix, src2d))
        ts = []
        for i in range(iters):
            qs = queries(100 + 7 * i + r, r)
            t0 = time.perf_counter()
            np.asarray(jf(qs, matrix, src2d))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    return max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)


def main():
    assert jax.default_backend() == "tpu", "probe is hardware-only"
    matrix = jax.block_until_ready(jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    allowed = jnp.asarray(np.array([topk.ALLOW_ALL] + [-9] * 15, np.int32))

    results = {}
    # both slabs missed the self-imposed 14 MB scoped-vmem cap by <250 KB
    # (14.24 / 14.03 M); raise the cap for the experiment
    topk._VMEM_LIMIT = 16 * 1024 * 1024
    for slab in (256, 512):
        topk.QUERY_SLAB = slab  # module global read at trace time
        try:
            t = marginal(
                lambda m, s2, qc, al: topk.pallas_topk_slabbed(m, s2, qc, al, K, False),
                matrix, src2d, allowed,
            )
            results[slab] = t
            print(f"slab {slab:4d}  sweep {t*1e3:8.2f} ms  {Q/t:9.0f} QPS "
                  f"(slab-128 base 140.05, floor 81.62)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"slab {slab:4d}  FAILED: {e}", flush=True)

    # exactness of the best slab vs slab-128
    best = min(results, key=results.get)
    q = jax.random.normal(jax.random.PRNGKey(42), (Q, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qc = np.asarray(q, np.float32).astype(jnp.bfloat16)

    topk.QUERY_SLAB = 128
    f0 = jax.jit(lambda m, s2, q_: topk.pallas_topk_slabbed(m, s2, q_, allowed, K, False))
    v0, r0 = f0(matrix, src2d, qc)
    sv0 = np.asarray(jax.lax.top_k(v0, K)[0])

    topk.QUERY_SLAB = best
    f1 = jax.jit(lambda m, s2, q_: topk.pallas_topk_slabbed(m, s2, q_, allowed, K, False))
    v1, r1 = f1(matrix, src2d, qc)
    sv1 = np.asarray(jax.lax.top_k(v1, K)[0])
    print(f"slab {best} exact match vs slab-128: values={bool((sv0 == sv1).all())}",
          flush=True)


if __name__ == "__main__":
    main()
