"""Probe round 2: isolate the int2 full-pipeline overhead (round 3).

probe_int2.py measured coarse scores-only at 1.43 ms (u8 masks, tile
12288, 672 GB/s) but the full pipeline at 2.90 ms — ~1.5 ms of
approx_max_k + gather + rerank.  Suspect: gathering 2048 columns of the
TRANSPOSED (D/2, N) int4 matrix = 393k strided single-byte reads.

This probe isolates each stage and tests the fix: a ROW-MAJOR (N, D/2)
uint8 fine matrix so the candidate gather is 2048 contiguous 192-byte
row reads (embedding-lookup shape, which XLA gathers well).

Phases (single process):
  1. coarse @12288 + approx_max_k(2048) only  -> approx_max_k cost
  2. coarse @12288 + row-major int4 gather rerank (K=2048) -> gather fix
  3. same with K_COARSE=4096 (the recall-preferred depth)
  4. coarse scores-only @16384 on a padded corpus (tile scaling)
  5. full row-major pipeline @16384, K=4096
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from benchmarks.probe_int2 import (  # noqa: E402
    N, D, D4, D2, allowed_np, int2_scores, gen_packed, marginal,
)
from perceive_tpu.ops.topk import quantize_queries  # noqa: E402

K_FINE = 128


def unpack_int4_rows(cols_u8):
    """(K, D/2) uint8 row-major -> (K, D) int8 (same nibble semantics as
    unpack_int4_xla, row-major orientation)."""
    p = cols_u8.astype(jnp.int32)
    hb = p >> 4
    return jnp.concatenate(
        [(p & 15) - 8, jnp.where(hb >= 8, hb - 16, hb)], axis=1
    ).astype(jnp.int8)


def pipeline_rowmajor(coarse, fine_rows, scales4, qi8, qscale, k_coarse):
    _, idx = jax.lax.approx_max_k(coarse, k_coarse, recall_target=0.999)
    rows_u8 = jnp.take(fine_rows, idx[0], axis=0)  # (K, D/2) contiguous rows
    lv = unpack_int4_rows(rows_u8)  # (K, D) int8
    iscores = jax.lax.dot_general(
        qi8, lv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    fine = iscores.astype(jnp.float32) * jnp.take(scales4, idx[0])[None, :] * qscale
    vals, perm = jax.lax.top_k(fine, K_FINE)
    return vals, jnp.take_along_axis(idx, perm, axis=1)


def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    fine_rows = jnp.transpose(gen_packed(jax.random.PRNGKey(4), D2, N))  # (N, D/2)
    fine_rows = jax.block_until_ready(fine_rows)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    scales4 = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print("arrays resident", flush=True)

    def mk_amk(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                coarse = int2_scores(p2, sc2, s2, qi8, qsc, allowed, 12288)
                cv, _ = jax.lax.approx_max_k(coarse, 2048, recall_target=0.999)
                return acc + jnp.sum(cv)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("coarse@12288 + approx_max_k(2048) only", mk_amk, (packed2, scales2d, src2d))

    for kc in (2048, 4096):
        def mk_full(r, kc=kc):
            def f(qs, p2, sc2, s2, fr, s4):
                def it(i, acc):
                    qi8, qsc = quantize_queries(qs[i])
                    coarse = int2_scores(p2, sc2, s2, qi8, qsc, allowed, 12288)
                    vals, rows = pipeline_rowmajor(coarse, fr, s4, qi8, qsc, kc)
                    return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
                return jax.lax.fori_loop(0, r, it, 0.0)
            return f
        marginal(f"full row-major pipeline @12288 K={kc}", mk_full,
                 (packed2, scales2d, src2d, fine_rows, scales4))

    # --- padded corpus for tile 16384 ---
    n2 = ((N + 16383) // 16384) * 16384
    pad = n2 - N
    packed2b = jax.block_until_ready(
        jnp.concatenate([packed2, jnp.zeros((D4, pad), jnp.uint8)], axis=1))
    scales2db = jax.block_until_ready(
        jnp.concatenate([scales2d, jnp.zeros((1, pad), jnp.float32)], axis=1))
    src2db = jax.block_until_ready(
        jnp.concatenate([src2d, jnp.full((1, pad), -1, jnp.int32)], axis=1))
    fine_rows_b = jax.block_until_ready(
        jnp.concatenate([fine_rows, jnp.zeros((pad, D2), jnp.uint8)], axis=0))
    scales4b = jax.block_until_ready(
        jnp.concatenate([scales4, jnp.zeros((pad,), jnp.float32)]))
    print(f"padded corpus: {n2} rows (+{pad})", flush=True)

    def mk_scores16(r):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                out = int2_scores(p2, sc2, s2, qi8, qsc, allowed, 16384)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("int2 u8 scores-only tile=16384", mk_scores16, (packed2b, scales2db, src2db))

    def mk_full16(r):
        def f(qs, p2, sc2, s2, fr, s4):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                coarse = int2_scores(p2, sc2, s2, qi8, qsc, allowed, 16384)
                vals, rows = pipeline_rowmajor(coarse, fr, s4, qi8, qsc, 4096)
                return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("full row-major pipeline @16384 K=4096", mk_full16,
             (packed2b, scales2db, src2db, fine_rows_b, scales4b))


if __name__ == "__main__":
    main()
