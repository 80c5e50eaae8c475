"""Probe: does HBM ALLOCATION HISTORY flip the int2-vs-int4 ranking?

probe_tier_ab (packed2 allocated first, fresh process) ranks int2 ahead
by ~0.3-0.5 ms, 13/15 rounds.  bench.py's process (a 7.7 GB bf16 corpus
allocated and freed first, then packed4, then packed2) once ranked int4
ahead by ~0.4 ms — and BOTH were within-process consistent under A/B
interleaving.  Reproduce both allocation histories in one script,
selected by argv, to isolate the variable:

  python -m benchmarks.probe_tier_alloc p2first      # probe_tier_ab order
  python -m benchmarks.probe_tier_alloc p4first      # bench order
  python -m benchmarks.probe_tier_alloc bf16_p4first # bench order + bf16 alloc/free

Measured: all three orders rank int2 ahead (paired diff +0.50 / +0.98 /
+0.55 ms, int2 wins 8/10 each) — allocation history is NOT the
variable; that bench run was an unlucky weather draw (BENCH_NOTES).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D2, D4, K, N, allowed_np, gen_packed, queries
from perceive_tpu.ops.topk import (
    pallas_topk_int4_unsorted,
    quantize_queries,
    scan_int2_coarse_fine,
)

R = 8
ROUNDS = 10
_MODES = ("p2first", "p4first", "bf16_p4first")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "p2first"
    assert mode in _MODES, f"unknown mode {mode!r}; pick one of {_MODES}"
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    if mode == "bf16_p4first":
        big = jax.block_until_ready(
            jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16)
        )
        del big
    if mode == "p2first":
        packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
        packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    else:
        packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
        packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    scales2d = jax.block_until_ready(scales.reshape(1, N))
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    src2d = jax.block_until_ready(src.reshape(1, N))
    print(f"arrays resident ({mode})", flush=True)

    def body_int2(q, p2, sc, s1, p4):
        v, rows, fl = scan_int2_coarse_fine(p2, sc, p4, sc, s1, q, allowed, K)
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)

    def body_int4(q, p4, sc2, s2):
        qi8, qsc = quantize_queries(q)
        v, rows = pallas_topk_int4_unsorted(p4, sc2, s2, qi8, qsc, allowed, K, False)
        return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

    marg = ab_interleaved_marginal(
        {
            "int2_c2f": (body_int2, (packed2, scales, src, packed4)),
            "int4_full": (body_int4, (packed4, scales2d, src2d)),
        },
        queries,
        r=R,
        rounds=ROUNDS,
    )
    report(marg)
    d = np.array(marg["int4_full"]) - np.array(marg["int2_c2f"])
    print(
        f"{mode}: paired diff (int4 - int2) median {np.median(d) * 1e3:+.3f} ms, "
        f"int2 wins {int((d > 0).sum())}/{ROUNDS}",
        flush=True,
    )


if __name__ == "__main__":
    main()
