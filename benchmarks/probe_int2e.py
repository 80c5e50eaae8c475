"""Probe round 5: hierarchical max-pool selection (EXACT top-2048).

The trick: window-128 maxes (cheap reduce over the (1, N) scores), take
the top-2048 windows by max, gather those windows' full score blocks
(contiguous 512 B each), final top_k over the 262k gathered scores.

Exactness: a row with global rank R has at most R-1 rows above it, so
at most R-1 windows have a higher max -> every rank<=2048 row's window
is inside the top-2048 windows -> the gathered set contains the entire
true top-2048 and the final top_k reproduces it exactly (ties aside).

Phases: selection-only cost, then the full int2 pipeline with it, then
the end-to-end candidate-exactness check vs lax.top_k on a prefix.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from benchmarks.probe_int2 import (  # noqa: E402
    N, D, D4, D2, allowed_np, gen_packed, marginal, int2_scores,
)
from benchmarks.probe_int2c import fine_rerank_t  # noqa: E402
from perceive_tpu.ops.topk import quantize_queries  # noqa: E402

WINDOW = 128
K_COARSE = 2048


def select_topk_hier(scores_row, k_coarse):
    """(N,) f32 -> (vals, idx) exact top-k_coarse via window-max pooling."""
    n = scores_row.shape[0]
    nw = n // WINDOW
    wmax = jnp.max(scores_row.reshape(nw, WINDOW), axis=1)
    _, widx = jax.lax.top_k(wmax, k_coarse)  # (k_coarse,) window ids
    blocks = jnp.take(scores_row.reshape(nw, WINDOW), widx, axis=0)  # (kc, 128)
    flat = blocks.reshape(-1)
    gidx = (widx[:, None] * WINDOW + jnp.arange(WINDOW)[None, :]).reshape(-1)
    v, p = jax.lax.top_k(flat, k_coarse)
    return v, jnp.take(gidx, p)


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    scores = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32))

    # exactness check vs lax.top_k on a small prefix (fast on device)
    small = 1_048_576
    v1, i1 = jax.jit(lambda s: select_topk_hier(s, 2048))(scores[:small])
    v2, i2 = jax.jit(lambda s: jax.lax.top_k(s, 2048))(scores[:small])
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    print("hier selection exactness OK", flush=True)

    def mk_sel(r):
        def f(qs, sc):
            def it(i, acc):
                s = sc + qs[i, 0, 0]
                v, idx = select_topk_hier(s, K_COARSE)
                return acc + jnp.sum(v) + jnp.sum(idx.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("hier select top-2048 only", mk_sel, (scores,))

    del scores
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print("arrays resident", flush=True)

    def mk_full(r):
        def f(qs, p2, sc2, s2, p4, sc4):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                coarse = int2_scores(p2, sc2, s2, qi8, qsc, allowed, 12288)
                cv, idx = select_topk_hier(coarse[0], K_COARSE)
                vals, rows = fine_rerank_t(p4, sc4, qi8, qsc, idx[None, :])
                return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + cv[-1]
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("FULL: int2 sweep -> hier top2048 -> int4 rerank -> top128",
             mk_full, (packed2, scales2d, src2d, packed4, scales2d))


if __name__ == "__main__":
    main()
