"""Probe: does the transposed-int8 slab kernel (the int2 tier's int8
fine-companion batch path, ops/topk.py int8t section) actually deliver
the row-major int8 slab's throughput?

Motivation: the default tier at 10M rows is int2 coarse-to-fine; its
BATCH path sweeps the fine companion.  With the int4 companion that
batch path measured 10.6k QPS vs the int8 tier's 19k — a structural
unpack deficit (probe_slab_k).  The int8 companion must be TRANSPOSED
(D, N) for the single-query candidate column gather, so the question is
whether the transposed layout's single full-depth dot matches the
row-major kernel (same MACs, same bytes; only the operand orientation
into the MXU differs).

Grid (k = 40, the factor-4 over-fetch for k=10 at int8 precision):
  int8_rm   row-major (N, D) slab kernel   — the int8 tier's batch path
  int8_t    transposed (D, N) slab kernel  — the int8-companion batch path
Interleaved rounds (benchmarks.abmarginal) at 10M x 384, batch 2048.
(The int4 companion's number is on record from probe_slab_k: 11.57k QPS
at k=40 / 10.6k at k=80; holding a third 10M corpus here OOMs the chip.)

MEASURED: see the `# RESULT` comment at the bottom of this file after a
run; the adoption decision is recorded in BENCH_NOTES.md round-3.
"""

import jax
import jax.numpy as jnp

from bench import rand_i8_chunked
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, N, allowed_np
from perceive_tpu.ops.topk import (
    pallas_topk_int8_slabbed,
    pallas_topk_int8t_slabbed,
    quantize_queries,
)

Q = 2048
K = 40
R = 3
ROUNDS = 8


def queries(seed, r):
    q = jax.random.normal(jax.random.PRNGKey(seed), (r, Q, D), jnp.float32)
    return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    # random int8 matrix in both layouts (bit-identical content irrelevant
    # to timing; build each independently to dodge a 3.8 GB transpose),
    # chunk-built via bench.rand_i8_chunked — a full-size random.bits
    # call's transients peak ~3x the matrix and OOM the 15.75 GB chip
    m8 = rand_i8_chunked(jax.random.PRNGKey(21), (N, D), 1 << 20)
    m8t = rand_i8_chunked(jax.random.PRNGKey(22), (D, N), 48)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print("arrays resident", flush=True)

    def body_rm(q, m, sc2, s2):
        qi8, qsc = quantize_queries(q)
        v, rows = pallas_topk_int8_slabbed(m, sc2, s2, qi8, qsc, allowed, K, False)
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

    def body_t(q, m, sc2, s2):
        qi8, qsc = quantize_queries(q)
        v, rows = pallas_topk_int8t_slabbed(m, sc2, s2, qi8, qsc, allowed, K, False)
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

    cases = {
        "int8_rm": (body_rm, (m8, scales2d, src2d)),
        "int8_t": (body_t, (m8t, scales2d, src2d)),
    }
    marg = ab_interleaved_marginal(cases, queries, r=R, rounds=ROUNDS)
    report(marg, qps_q=Q)


if __name__ == "__main__":
    main()


# RESULT (1x v5e-class chip via tunnel, 10M x 384, batch 2048, k=40,
# 8 interleaved rounds, 2026-08-19):
#   int8_rm   p50 106.618 ms  IQR [106.522, 107.017]  19,208.8 QPS
#   int8_t    p50 106.701 ms  IQR [106.389, 106.863]  19,193.8 QPS
# The transposed layout is statistically identical to row-major (paired
# medians within 0.1%): the MXU consumes the (D, TILE) operand as well as
# the (TILE, D) one, and the sweep is MXU-bound at this batch width.
# Adopted: int2_fine_bits defaults the companion to int8 whenever
# coarse+fine fit the HBM budget — the default tier's batch path goes
# 10.6k -> 19.2k QPS with no latency or recall cost (int8-precision fine
# rescoring needs only the factor-4 over-fetch).
