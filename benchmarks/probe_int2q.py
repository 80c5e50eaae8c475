"""Probe round 16: hierarchical-select WINDOW size.  The final
lax.top_k runs over kc*window gathered scores (524k at window=128,
kc=4096) — a smaller window shrinks that sort; the first-level top_k
over n/window maxes grows.  Exactness is window-independent (same
rank argument).  Full production pipeline, one process, kc=4096."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2n import (
    N, D, D4, D2, K, allowed_np, gen_packed, queries, marginal,
)
from benchmarks.probe_int2 import int2_scores
from perceive_tpu.ops.topk import quantize_queries, unpack_int4_xla

KC = 4096


def select_hier_w(scores_row, kc, w):
    n = scores_row.shape[0]
    nw = n // w
    wmax = jnp.max(scores_row.reshape(nw, w), axis=1)
    _, widx = jax.lax.top_k(wmax, kc)
    blocks = jnp.take(scores_row.reshape(nw, w), widx, axis=0)
    gidx = (widx[:, None] * w + jnp.arange(w)[None, :]).reshape(-1)
    v, p = jax.lax.top_k(blocks.reshape(-1), kc)
    return v, jnp.take(gidx, p)


def fine_q1(packed4, scales4, qi8, qscale, idx):
    cols = jnp.take(packed4, idx[0], axis=1)
    lv = unpack_int4_xla(cols)
    iscores = jax.lax.dot_general(
        qi8, lv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    fine = iscores.astype(jnp.float32) * jnp.take(scales4, idx[0])[None, :] * qscale
    vals, perm = jax.lax.top_k(fine, K)
    return vals, jnp.take_along_axis(idx, perm, axis=1)


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    scales4 = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    arrays = (packed2, scales2d, src2d, packed4, scales4)
    print("arrays resident", flush=True)

    # set-equality across windows on one query (exactness is theorem'd,
    # this guards the index math)
    q0 = queries(7, 1)[0]
    ref = None
    for w in (32, 128):
        fn = jax.jit(lambda q, p2, sc2, s2, p4, sc4, w=w: select_hier_w(
            int2_scores(p2, sc2, s2, *quantize_queries(q), allowed, 12288)[0], KC, w))
        v, i = fn(q0, *arrays)
        s = set(np.asarray(i).tolist())
        if ref is None:
            ref = s
        else:
            assert s == ref, f"window {w} diverged"
    print("window set-check OK", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk(w):
        def body(q, p2, sc2, s2, p4, sc4):
            qi8, qsc = quantize_queries(q)
            coarse = int2_scores(p2, sc2, s2, qi8, qsc, allowed, 12288)
            cv, idx = select_hier_w(coarse[0], KC, w)
            vals, rows = fine_q1(p4, sc4, qi8, qsc, idx[None, :])
            return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32)) + cv[-1]
        return lambda r: loop(r, body)

    for w in (256, 128, 64, 32, 16):
        marginal(f"q. window={w} kc=4096", mk(w), arrays)


if __name__ == "__main__":
    main()
