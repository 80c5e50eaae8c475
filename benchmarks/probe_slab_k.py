"""Probe: is the int4 slab kernel's 2x QPS deficit vs int8 the MERGE
DEPTH (k=80 rerank over-fetch vs int8's k=40) or the unpack algebra?

int4's two half-depth masked dots are the SAME MAC count as int8's one
full-depth dot, and it reads half the bytes — yet bench measures 10.5k
QPS (int4 slab, k=80) vs 19.3k (int8 slab, k=40) at batch 2048 / 10M.
If the k=80 merge were the cost, a shallower batch over-fetch (plus
per-query escalation) could nearly double the default tier's batch
throughput.  Grid: {int4, int8} x {k=40, k=80}, interleaved rounds
(benchmarks.abmarginal).

Measured: int4 k=40 11.6k / k=80 10.6k; int8 k=40 19.0k / k=80 16.6k —
halving the merge depth buys int4 only 9%; the 64% gap at equal k is
the kernel body (masked-view bitcasts + two half-depth dots).  Parked
(BENCH_NOTES round-3).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D2, N, allowed_np, gen_packed
from perceive_tpu.ops.topk import (
    pallas_topk_int4_slabbed,
    pallas_topk_int8_slabbed,
    quantize_queries,
)

Q = 2048
R = 3
ROUNDS = 6


def queries(seed, r):
    q = jax.random.normal(jax.random.PRNGKey(seed), (r, Q, D), jnp.float32)
    return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    m8_halves = []
    for i in range(2):
        w = jax.random.bits(jax.random.PRNGKey(21 + i), (N // 2, D // 4), jnp.uint32)
        m8_halves.append(jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(N // 2, D))
        del w
    m8 = jnp.concatenate(m8_halves, axis=0)
    del m8_halves
    m8 = jax.block_until_ready(jax.lax.bitcast_convert_type(m8, jnp.int8))
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print("arrays resident", flush=True)

    def mk4(k):
        def body(q, m, sc2, s2):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int4_slabbed(m, sc2, s2, qi8, qsc, allowed, k, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return body, (packed4, scales2d, src2d)

    def mk8(k):
        def body(q, m, sc2, s2):
            qi8, qsc = quantize_queries(q)
            v, rows = pallas_topk_int8_slabbed(m, sc2, s2, qi8, qsc, allowed, k, False)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return body, (m8, scales2d, src2d)

    cases = {}
    for bits, k in itertools.product((4, 8), (40, 80)):
        body, args = (mk4 if bits == 4 else mk8)(k)
        cases[f"int{bits}_k{k}"] = (body, args)
    marg = ab_interleaved_marginal(cases, queries, r=R, rounds=ROUNDS)
    report(marg, qps_q=Q)


if __name__ == "__main__":
    main()
