"""Probe round 15: validate the REWORKED production scan_int2_coarse_fine
(unrolled select, 12288 tile) on hardware, and price the coarse depth:
kc=4096 (default) vs 2048, plus Q=8 (the _INT2_MAX_Q ceiling: 8 unrolled
selects in one program)."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import (
    N, D, D4, D2, K, allowed_np, gen_packed, queries, marginal,
)
from perceive_tpu.ops.topk import scan_int2_coarse_fine


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales2 = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    arrays = (packed2, scales2, src, packed4)
    print("arrays resident", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk(kc, k=K):
        def body(q, p2, sc2, s2, p4):
            v, rows, fl = scan_int2_coarse_fine(
                p2, sc2, p4, sc2, s2, q, allowed, k, k_coarse=kc
            )
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return lambda r: loop(r, body)

    marginal("p0. reworked production kc=4096 k=128", mk(4096), arrays)
    marginal("p1. reworked production kc=2048 k=128", mk(2048), arrays)
    marginal("p2. reworked production kc=2048 k=10", mk(2048, 10), arrays)

    # Q=8 ceiling: one program, 8 unrolled selects
    def mk_q8(kc):
        def f(qs, p2, sc2, s2, p4):
            q8 = jnp.concatenate([qs[i] for i in range(qs.shape[0])], axis=0)
            v, rows, fl = scan_int2_coarse_fine(
                p2, sc2, p4, sc2, s2, q8, allowed, K, k_coarse=kc
            )
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return f

    import time
    for label, kc in [("p3. Q=8 kc=2048", 2048)]:
        fn = jax.jit(mk_q8(kc))
        np.asarray(fn(queries(1, 8), *arrays))
        ts = []
        for i in range(5):
            qs = queries(50 + i, 8)
            t0 = time.perf_counter()
            np.asarray(fn(qs, *arrays))
            ts.append(time.perf_counter() - t0)
        print(f"{label}: wall {np.median(ts)*1e3:.1f} ms for 8 queries", flush=True)


if __name__ == "__main__":
    main()
