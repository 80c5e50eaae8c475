"""Marginal-method probes for the next perf steps.

ARG=h     : int4 variant H (algebraic hi-nibble: only native `&` + bitcasts,
            3 stacked int8 dots) vs the shipped int32-unpack kernel.
ARG=qps   : int8 slabbed kernel at batch 2048, k=40 (the 4x rerank
            over-fetch) — candidate to beat the bf16 14.6k QPS headline.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perceive_tpu.ops.topk import (
    ALLOW_ALL,
    _merge_tile_topk,
    _source_mask,
    pallas_topk_int4_unsorted,
    pallas_topk_int8_slabbed,
    quantize_queries,
)

N, D = 10_002_432, 384
D2 = D // 2
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)
rng = np.random.default_rng(0)


def marginal(name, make_fn, args, qmaker, reps=(1, 17), iters=3):
    walls = {}
    try:
        for r in reps:
            fn = jax.jit(make_fn(r))
            np.asarray(fn(qmaker(1, r), *args))
            ts = []
            for i in range(iters):
                qs = qmaker(100 + 7 * i + r, r)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *args))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    m = (walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0])
    print(f"{name}: marginal {m*1e3:.2f} ms/sweep (wall1 {walls[reps[0]]*1e3:.0f}ms)", flush=True)
    return m


def _kernel_h(allowed_ref, qlo_ref, qhi_ref, qcorr_ref, qscale_ref, m_ref, src_ref,
              scales_ref, vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter, d2):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    p = m_ref[:]
    lo = jax.lax.bitcast_convert_type(p & jnp.uint8(15), jnp.int8)
    x8 = jax.lax.bitcast_convert_type(p, jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m1 = jax.lax.dot_general(qlo_ref[:], lo, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(qhi_ref[:], x8, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(qhi_ref[:], lo, dims, preferred_element_type=jnp.int32)
    raw = m1.astype(jnp.float32) + (m2 - m3).astype(jnp.float32) * 0.0625 + qcorr_ref[:]
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    sc_ref[:] = jnp.where(mask, scores, -jnp.inf)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * tile_n, k, n_iota, k_iota)


def call_h(packed, scales2d, src2d, qlo, qhi, qcorr, qscale, allowed, k, tile_n=4096):
    d2, n = packed.shape
    nq = qlo.shape[0]
    kern = functools.partial(_kernel_h, k=k, tile_n=tile_n, n_filter=allowed.shape[0], d2=d2)
    return pl.pallas_call(
        kern,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=14 * 1024 * 1024),
    )(allowed, qlo, qhi, qcorr, qscale, packed, src2d, scales2d)


def main_h():
    print("backend:", jax.default_backend(), flush=True)
    allowed = jnp.asarray(allowed_np)
    words = jax.random.bits(jax.random.PRNGKey(0), (D2, N // 4), jnp.uint32)
    packed = jax.block_until_ready(jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(D2, N))
    del words
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))

    def qmaker(seed, r):
        q = rng.standard_normal((r, 1, D)).astype(np.float32)
        q /= np.linalg.norm(q, axis=2, keepdims=True)
        return jax.block_until_ready(jnp.asarray(q))

    def shipped(r):
        def f(qs, m, s2, sc2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                v, rr = pallas_topk_int4_unsorted(m, sc2, s2, qi8, qsc, allowed, 128, False)
                return acc + jnp.sum(v) + jnp.sum(rr.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def varh(r):
        def f(qs, m, s2, sc2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                qlo, qhi = qi8[:, :D2], qi8[:, D2:]
                qcorr = (-8.0 * jnp.sum(qlo.astype(jnp.int32), axis=1, keepdims=True)).astype(jnp.float32)
                v, rr = call_h(m, sc2, s2, qlo, qhi, qcorr, qsc, allowed, 128)
                return acc + jnp.sum(v) + jnp.sum(rr.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    marginal("int4 shipped (int32 unpack)", shipped, (packed, src2d, scales2d), qmaker)
    marginal("int4 variant H (& + 3 dots)", varh, (packed, src2d, scales2d), qmaker)


def main_qps():
    print("backend:", jax.default_backend(), flush=True)
    allowed = jnp.asarray(allowed_np)
    halves = []
    for i in range(2):
        w = jax.random.bits(jax.random.PRNGKey(2 + i), (N // 2, D // 4), jnp.uint32)
        halves.append(jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(N // 2, D))
        del w
    m8 = jnp.concatenate(halves, axis=0)
    del halves
    m8 = jax.block_until_ready(jax.lax.bitcast_convert_type(m8, jnp.int8))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))

    def qmaker(seed, r):
        q = rng.standard_normal((r, 2048, D)).astype(np.float32)
        q /= np.linalg.norm(q, axis=2, keepdims=True)
        return jax.block_until_ready(jnp.asarray(q))

    def slab(r):
        def f(qs, m, s2, sc2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                v, rr = pallas_topk_int8_slabbed(m, sc2, s2, qi8, qsc, allowed, 40, False)
                return acc + jnp.sum(v) + jnp.sum(rr.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    m = marginal("int8 slabbed Q=2048 k=40", slab, (m8, src2d, scales2d), qmaker, reps=(1, 5))
    if m:
        print(f"  -> {2048/m:.0f} exact-after-rerank QPS", flush=True)


if __name__ == "__main__":
    (main_qps if len(sys.argv) > 1 and sys.argv[1] == "qps" else main_h)()
