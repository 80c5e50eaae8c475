"""Probe round 17: phase-split the 1.95 ms production int2 pipeline and
price sweep-side levers (probe_int2s showed the SELECT rewrites all lose:
XLA's big-k top_k is not the bottleneck).

  t0. production scan_int2_coarse_fine            (full, baseline)
  t1. sweep only (pallas_int2_scores + sum)       -> sweep phase cost
  t2. sweep + unrolled select                     -> +select cost
  t3. sweep @ tile 24576 (2x the 12288 winner; VMEM limit permitting)
  t4. nosrc sweep only                            -> the 40 MB src read
  t5. sweep with bf16 scales read                 -> the 20 MB scales half
  t6. raw-read roofline: sum() over the 960 MB packed + 40+40 MB sides
      (what pure HBM streaming of the same bytes costs on this chip)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed, queries
from benchmarks.probe_int2s import sweep_nosrc, select_hier1
from perceive_tpu.ops.topk import (
    _VMEM_LIMIT,
    _int2_query_parts,
    _scan_kernel_int2_scores,
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
)

KC = 4096


def sweep_tile(packed, scales2d, src2d, qi8, qscale, allowed, tile_n,
               scales_dtype=jnp.float32):
    d4, n = packed.shape
    nq = qi8.shape[0]
    q0, q1, q2, q3, qcorr = _int2_query_parts(qi8, d4)
    kernel = functools.partial(_scan_kernel_int2_scores, n_filter=allowed.shape[0])
    if scales_dtype != scales2d.dtype:
        scales2d = scales2d.astype(scales_dtype)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d4, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * nq * n * d4,
            bytes_accessed=n * d4 + n * 8 + nq * n * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=False,
    )(allowed, q0, q1, q2, q3, qcorr, qscale, packed, src2d, scales2d)


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

    def marginal(label, mk, args, reps=(2, 12), iters=5):
        walls = {}
        for r in reps:
            fn = jax.jit(mk(r))
            np.asarray(fn(queries(1, r), *args))
            ts = []
            for i in range(iters):
                qs = queries(100 + 7 * i + r, r)
                t0 = time.perf_counter()
                np.asarray(fn(qs, *args))
                ts.append(time.perf_counter() - t0)
            walls[r] = float(np.median(ts))
        marg = max((walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0]), 1e-9)
        print(f"{label}: {marg*1e3:.3f} ms  (wall1 {walls[reps[0]]*1e3:.1f} ms)", flush=True)
        return marg

    def mk_t0(r):
        def body(q, p2, sc, s, p4, sc4):
            v, rows, fl = scan_int2_coarse_fine(p2, sc[0], p4, sc4, s[0], q, allowed, K)
            return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32)) + jnp.sum(fl)
        return loop(r, body)

    def mk_sweep(sweep):
        def mk(r):
            def body(q, p2, sc, s, p4, sc4):
                qi8, qscale = quantize_queries(q)
                c = sweep(p2, sc, s, qi8, qscale)
                return jnp.sum(c.astype(jnp.float32))
            return loop(r, body)
        return mk

    def mk_t2(r):
        def body(q, p2, sc, s, p4, sc4):
            qi8, qscale = quantize_queries(q)
            c = pallas_int2_scores(p2, sc, s, qi8, qscale, allowed, False)
            v, p = select_hier1(c[0], KC)
            return jnp.sum(v) + jnp.sum(p.astype(jnp.float32))
        return loop(r, body)

    marginal("t0. production full", mk_t0, arrays)
    marginal("t1. sweep only (tile auto=12288)",
             mk_sweep(lambda p2, sc, s, qi8, qs: pallas_int2_scores(
                 p2, sc, s, qi8, qs, allowed, False)), arrays)
    marginal("t2. sweep + select", mk_t2, arrays)
    for tile in (24576, 16384 if N % 16384 == 0 else 12288):
        if N % tile:
            continue
        try:
            marginal(f"t3. sweep @ tile {tile}",
                     mk_sweep(lambda p2, sc, s, qi8, qs, t=tile: sweep_tile(
                         p2, sc, s, qi8, qs, allowed, t)), arrays)
        except Exception as e:  # VMEM overflow etc.
            print(f"t3. tile {tile}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    marginal("t4. nosrc sweep only",
             mk_sweep(lambda p2, sc, s, qi8, qs: sweep_nosrc(p2, sc, qi8, qs)), arrays)
    try:
        marginal("t5. bf16-scales sweep only",
                 mk_sweep(lambda p2, sc, s, qi8, qs: sweep_tile(
                     p2, sc, s, qi8, qs, allowed, 12288, jnp.bfloat16)), arrays)
    except Exception as e:
        print(f"t5. FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    def mk_t6(r):
        def body(q, p2, sc, s, p4, sc4):
            # loop-varying threshold compare: not algebraically hoistable,
            # forces a full 960 MB packed read per iteration
            thr = (q[0, 0] * 64.0 + 128.0).astype(jnp.uint8)
            return jnp.sum((p2 > thr).astype(jnp.float32))
        return loop(r, body)

    marginal("t6. packed-only 960MB threshold-count", mk_t6, arrays)


if __name__ == "__main__":
    main()
