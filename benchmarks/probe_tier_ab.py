"""Probe: is the int2 coarse-to-fine tier RELIABLY faster than the int4
full sweep?  BENCH runs disagree across processes (int2 2.44-3.09 ms,
int4 2.70-3.36 ms — one run even ranked them opposite ways), and the
notes' device-weather warnings say cross-process numbers can't settle
it.  So: ONE process, both complete pipelines pre-compiled over the
same-size corpora, A/B/A/B interleaved invocations (drift cancels in
the pairwise diff), in-jit repeat marginals, median over the rounds
(benchmarks.abmarginal — the shared harness).

Decides whether auto_matrix_dtype's 4M-24M -> int2 rule actually buys
latency on this chip or only on paper.  Measured (first run): int2
2.301 ms vs int4 2.794, int2 wins 13/15 — the rule stands.
"""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import (
    D,
    D2,
    D4,
    K,
    N,
    allowed_np,
    gen_packed,
    queries,
)
from perceive_tpu.ops.topk import (
    pallas_topk_int4_unsorted,
    quantize_queries,
    scan_int2_coarse_fine,
)

R = 10
ROUNDS = 15


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    scales2d = jax.block_until_ready(scales.reshape(1, N))
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    src2d = jax.block_until_ready(src.reshape(1, N))
    print("arrays resident", flush=True)

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
        f"paired diff (int4 - int2): median {np.median(d) * 1e3:+.3f} ms, "
        f"int2 wins {int((d > 0).sum())}/{ROUNDS} rounds",
        flush=True,
    )


if __name__ == "__main__":
    main()
