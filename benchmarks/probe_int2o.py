"""Probe round 14: morph-bisect probe_int2e's 1.94 ms FULL into the 5.3 ms
production scan_int2_coarse_fine, one axis at a time, ONE process.

  o0. probe_e FULL verbatim   (tile 12288, kc 2048, Q1-specialized hier+fine)
  o1. o0 with tile 8192       (isolate the sweep tile)
  o2. o0 with kc 4096         (isolate coarse depth)
  o3. o0 with batched select  (isolate the (Q,N)-batched select form)
  o4. o0 with production fine (argsort ordering, isfinite remask, einsum)
  o5. production scan_int2_coarse_fine (kc=4096 tile=8192) -- repro anchor
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.probe_int2 import int2_scores
from benchmarks.probe_int2n import (
    N, D, D4, D2, K, allowed_np, gen_packed, queries, marginal,
    select_hier_batched, fine_phase,
)
from perceive_tpu.ops.topk import (
    _INT2_WINDOW,
    quantize_queries,
    scan_int2_coarse_fine,
    unpack_int4_xla,
)


def select_hier_q1(scores_row, kc):
    w = _INT2_WINDOW
    nw = scores_row.shape[0] // w
    wmax = jnp.max(scores_row.reshape(nw, w), axis=1)
    _, widx = jax.lax.top_k(wmax, kc)
    blocks = jnp.take(scores_row.reshape(nw, w), widx, axis=0)
    gidx = (widx[:, None] * w + jnp.arange(w)[None, :]).reshape(-1)
    v, p = jax.lax.top_k(blocks.reshape(-1), kc)
    return v, jnp.take(gidx, p)


def fine_q1(packed4, scales4, qi8, qscale, idx):
    cols = jnp.take(packed4, idx[0], axis=1)  # (D/2, K)
    lv = unpack_int4_xla(cols)  # (D, K) int8
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

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                return acc + body(qs[i], *args)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def mk(tile, kc, batched_sel, prod_fine):
        def body(q, p2, sc2, s2, p4, sc4):
            qi8, qsc = quantize_queries(q)
            coarse = int2_scores(p2, sc2, s2, qi8, qsc, allowed, tile)
            if batched_sel:
                cv, idx = select_hier_batched(coarse, kc)
            else:
                cv1, idx1 = select_hier_q1(coarse[0], kc)
                cv, idx = cv1[None, :], idx1[None, :]
            if prod_fine:
                vals, rows = fine_phase(cv, idx, qi8, qsc, p4, sc4, K, False)
            else:
                vals, rows = fine_q1(p4, sc4, qi8, qsc, idx)
            return jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
        return lambda r: loop(r, body)

    marginal("o0. probe_e verbatim (t12288 kc2048 q1)", mk(12288, 2048, False, False), arrays)
    marginal("o1. o0 @ tile 8192", mk(8192, 2048, False, False), arrays)
    marginal("o2. o0 @ kc 4096", mk(12288, 4096, False, False), arrays)
    marginal("o3. o0 w/ batched select", mk(12288, 2048, True, False), arrays)
    marginal("o4. o0 w/ production fine", mk(12288, 2048, False, True), arrays)

    def mk_prod(r):
        def body(q, p2, sc2, s2, p4, sc4):
            v, rows, _ = scan_int2_coarse_fine(
                p2, sc2[0], p4, sc4, s2[0], q, allowed, K
            )
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))
        return loop(r, body)
    marginal("o5. production (t8192 kc4096)", mk_prod, arrays)


if __name__ == "__main__":
    main()
