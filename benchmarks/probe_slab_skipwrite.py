"""Probe: where do the batch-2048 bf16 sweep's non-MXU microseconds go?

Theoretical MXU floor for Q=2048 over 10,002,432x384 bf16 on a v5e-class
chip (197 TFLOP/s) is ~80 ms/sweep; measured is ~140 ms (57% MXU).  Three
variants, measured with the in-jit repeat marginal (bench.py method):

  base       current pallas_topk_slabbed (always writes the (128, TILE)
             f32 scratch + runs the threshold-pruned merge)
  dotmax     dot + masked row-max only (no scratch write, no merge) — the
             achievable floor for this loop structure
  skipwrite  compute the masked tile-max from registers; only write the
             scratch + merge when some query's buffer min would improve
             (warm buffers reject ~all tiles, so the 2 MB store + merge
             reads vanish from the steady state)

Also: embed throughput at batch 512 vs the bench's 256 (same process —
one device allocation of the corpus, freed before the tower).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    QUERY_SLAB,
    _merge_tile_topk,
    _source_mask,
    _VMEM_LIMIT,
)

N, D, Q, K = 10_002_432, 384, 2048, 10
TILE = 4096


def _kernel_dotmax(allowed_ref, q_ref, m_ref, src_ref, vals_ref, *, tile_n, n_filter, n_slabs):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    m_tile = m_ref[:]
    for s in range(n_slabs):
        qsl = slice(s * QUERY_SLAB, (s + 1) * QUERY_SLAB)
        scores = jax.lax.dot_general(
            q_ref[qsl, :], m_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tv = jnp.max(jnp.where(mask, scores, -jnp.inf), axis=1, keepdims=True)
        vals_ref[qsl, :] = jnp.maximum(vals_ref[qsl, :], tv)


def pallas_dotmax(matrix, src2d, qc, allowed):
    n, d = matrix.shape
    nq = qc.shape[0]
    kernel = functools.partial(
        _kernel_dotmax, tile_n=TILE, n_filter=allowed.shape[0], n_slabs=nq // QUERY_SLAB
    )
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d, bytes_accessed=n * d * 2 + nq * d * 4, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(allowed, qc, matrix, src2d)


def _kernel_skipwrite(
    allowed_ref, q_ref, m_ref, src_ref, vals_ref, rows_ref, sc_ref,
    *, k, tile_n, n_filter, n_slabs,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    m_tile = m_ref[:]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, tile_n), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (QUERY_SLAB, k), 1)

    for s in range(n_slabs):
        qsl = slice(s * QUERY_SLAB, (s + 1) * QUERY_SLAB)
        scores = jax.lax.dot_general(
            q_ref[qsl, :], m_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        msc = jnp.where(mask, scores, -jnp.inf)
        tv = jnp.max(msc, axis=1, keepdims=True)
        need = jnp.any(tv > jnp.min(vals_ref[qsl, :], axis=1, keepdims=True))

        @pl.when(need)
        def _(msc=msc, qsl=qsl):
            sc_ref[:] = msc
            _merge_tile_topk(sc_ref, vals_ref, rows_ref, qsl, t * tile_n, k, n_iota, k_iota)


def pallas_skipwrite(matrix, src2d, qc, allowed, k):
    n, d = matrix.shape
    nq = qc.shape[0]
    kernel = functools.partial(
        _kernel_skipwrite, k=k, tile_n=TILE, n_filter=allowed.shape[0],
        n_slabs=nq // QUERY_SLAB,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((QUERY_SLAB, TILE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d, bytes_accessed=n * d * 2 + nq * d * 4, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(allowed, qc, matrix, src2d)


def marginal(fn, matrix, src2d, allowed, reps=(1, 3), iters=3):
    def queries(seed, r):
        q = jax.random.normal(jax.random.PRNGKey(seed), (r, Q, D), jnp.float32)
        return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

    def make(r):
        def f(qs, m, s2):
            def it(i, acc):
                out = fn(m, s2, qs[i].astype(m.dtype), allowed)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return jax.jit(f)

    walls = {}
    for r in reps:
        jf = make(r)
        np.asarray(jf(queries(1, r), matrix, src2d))
        ts = []
        for i in range(iters):
            qs = queries(100 + 7 * i + r, r)
            t0 = time.perf_counter()
            np.asarray(jf(qs, matrix, src2d))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    return max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)


def main():
    assert jax.default_backend() == "tpu", "probe is hardware-only"
    from perceive_tpu.ops.topk import pallas_topk_slabbed

    matrix = jax.block_until_ready(jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    allowed = jnp.asarray(np.array([ALLOW_ALL] + [-9] * 15, np.int32))

    base = marginal(
        lambda m, s2, qc, al: pallas_topk_slabbed(m, s2, qc, al, K, False),
        matrix, src2d, allowed,
    )
    print(f"base      sweep {base*1e3:8.2f} ms  {Q/base:9.0f} QPS", flush=True)

    floor = marginal(pallas_dotmax, matrix, src2d, allowed)
    print(f"dotmax    sweep {floor*1e3:8.2f} ms  {Q/floor:9.0f} QPS (floor)", flush=True)

    skip = marginal(
        lambda m, s2, qc, al: pallas_skipwrite(m, s2, qc, al, K),
        matrix, src2d, allowed,
    )
    print(f"skipwrite sweep {skip*1e3:8.2f} ms  {Q/skip:9.0f} QPS", flush=True)

    # correctness: skipwrite must match base exactly (same merge, same order)
    q = jax.random.normal(jax.random.PRNGKey(42), (Q, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qc = q.astype(matrix.dtype)
    v0, r0 = jax.jit(lambda: pallas_topk_slabbed(matrix, src2d, qc, allowed, K, False))()
    v1, r1 = jax.jit(lambda: pallas_skipwrite(matrix, src2d, qc, allowed, K))()
    sv0, p0 = jax.lax.top_k(v0, K)
    sv1, p1 = jax.lax.top_k(v1, K)
    same_v = bool(jnp.all(sv0 == sv1))
    same_r = bool(
        jnp.all(jnp.take_along_axis(r0, p0, 1) == jnp.take_along_axis(r1, p1, 1))
    )
    print(f"exact match vs base: values={same_v} rows={same_r}", flush=True)

    del matrix, src2d
    # embed throughput at batch 512 (bench.py measures 256)
    import bench

    for b in (256, 512):
        bench.EMBED_BATCH = b
        dps = bench.measure_embed_docs_per_sec()
        print(f"embed batch {b}: {dps:8.0f} docs/s", flush=True)


if __name__ == "__main__":
    main()
