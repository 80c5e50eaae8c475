"""Probe: window-cut selection vs exact top-kc selection in the int2 tier.

The exact path's selection cost is dominated by big-k sorts (kc=4096 vs
2048 measured +0.8 ms, BENCH_NOTES round-3), and kc=4096 is the recall
floor (depth study).  The window-cut variant (ops/topk._select_window_fine)
removes the kc*128-element final top_k entirely: take the top kc WINDOWS
by window max and fine-rescore all kc*128 rows in them as a streaming
block gather + int8 matmul.  Candidates are a strict recall SUPERSET of
the exact path at equal kc (the kc-th window max <= the kc-th row score),
so the only question is latency: does swapping a big sort for ~200-600 MB
of gather/matmul traffic win on this chip?

Cases (full scan_int2_coarse_fine pipelines, Q=1, k=128 fetch, 10M x 384):
  exact8  — production: exact hier select + column gather, int8 companion
  win8    — window-cut, int8 companion (600 MB fine traffic)
  exact4  — production with the int4 packed companion
  win4    — window-cut, int4 companion (300 MB + unpack)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from bench import _rand_i8t  # chunked gen: randint would stage (D, N) int32
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D2, D4, K, N, allowed_np, gen_packed, queries
from perceive_tpu.ops.topk import scan_int2_coarse_fine

R = 8
ROUNDS = 15


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "8"  # "8" | "4" companion
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    if which == "8":
        fine = _rand_i8t(jax.random.PRNGKey(8), D, N)
        fine_bits = 8
    else:
        fine = gen_packed(jax.random.PRNGKey(4), D2, N)
        fine_bits = 4
    scales = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)

    def body(select, fine_bits):
        def f(q, p2, sc, s1, pf):
            v, rows, fl = scan_int2_coarse_fine(
                p2, sc, pf, sc, s1, q, allowed, K,
                select=select, fine_bits=fine_bits,
            )
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return f

    variant = sys.argv[2] if len(sys.argv) > 2 else "window"
    a, b = f"exact{which}", f"{variant[:3]}{which}"
    marg = ab_interleaved_marginal(
        {
            a: (body("exact", fine_bits), (packed2, scales, src, fine)),
            b: (body(variant, fine_bits), (packed2, scales, src, fine)),
        },
        queries,
        r=R,
        rounds=ROUNDS,
    )
    report(marg)
    if a in marg and b in marg:
        d = np.array(marg[a]) - np.array(marg[b])
        print(
            f"paired diff ({a} - {b}): median {np.median(d) * 1e3:+.3f} ms, "
            f"{variant} wins {int((d > 0).sum())}/{ROUNDS} rounds",
            flush=True,
        )


if __name__ == "__main__":
    main()
