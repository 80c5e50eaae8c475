"""Probe round 16: attack the selection sorts + the sweep's side bytes.

Production scan_int2_coarse_fine @10M = 2.44 ms: sweep ~1.43 ms
(bandwidth floor of 960 MB packed + 120 MB side bytes at ~755 GB/s raw),
selection ~0.6-0.9 ms (two big-k sorts: top_k(87k, 4096) on window maxes
and top_k(524k, 4096) on the gathered blocks), fine ~0.2 ms.

Candidates, all measured IN ONE PROCESS against production (the
probe_int2n lesson — cross-process numbers disagree by 5x):

  s0. production scan_int2_coarse_fine (kc=4096)        baseline
  s1. TWO-LEVEL hier select, W2=16: the 524k sort becomes a 16-wide
      submax pool (32k sort) + subblock gather (65k sort).  Exact by the
      same per-level argument as the one-level select, so the floor
      stays the true global kc-th score.
  s2. s1 with W2=8 (32k + 65k swap roles: 65k submaxes, 32k gathered)
  s3. s1 + NOSRC sweep kernel: drops the (1, N) i32 source-id read when
      the query has no source filter (the common serve case) -- -40 MB
  s4. s3 + bf16 score write (-20 MB write, pooling reads halve)
  s5. s4 + in-kernel window-max side output (pooling read drops to 0)

Set-checked: s1/s2 candidate rows must equal production's exactly
(same floor, same set).  s4/s5 are checked for top-k row-set equality
at f32-vs-bf16 tie tolerance (recall harness required before adoption).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.probe_int2n import N, D, D4, D2, K, allowed_np, gen_packed, queries
from perceive_tpu.ops.topk import (
    _INT2_WINDOW,
    _VMEM_LIMIT,
    _int2_query_parts,
    _pick_tile_int2,
    pallas_int2_scores,
    quantize_queries,
    scan_int2_coarse_fine,
    unpack_int4_xla,
)

KC = 4096


# --- selection variants ----------------------------------------------------

def select_hier1(scores_row, k):
    """Production one-level select (copied semantics for A/B in-file)."""
    n = scores_row.shape[0]
    w = _INT2_WINDOW
    nw = n // w
    wmax = jnp.max(scores_row.reshape(nw, w), axis=1)
    _, widx = jax.lax.top_k(wmax, k)
    blocks = jnp.take(scores_row.reshape(nw, w), widx, axis=0)
    gidx = (widx[:, None] * w + jnp.arange(w)[None, :]).reshape(-1)
    v, p = jax.lax.top_k(blocks.reshape(-1), k)
    return v, jnp.take(gidx, p)


def select_hier2(scores_row, k, w2):
    """Exact two-level hierarchical top-k (see module docstring)."""
    n = scores_row.shape[0]
    w = _INT2_WINDOW
    nw = n // w
    wmax = jnp.max(scores_row.reshape(nw, w), axis=1)
    _, widx = jax.lax.top_k(wmax, k)                       # sort1: nw
    blocks = jnp.take(scores_row.reshape(nw, w), widx, axis=0)  # (k, w)
    sub = blocks.reshape(k * w // w2, w2)
    smax = jnp.max(sub, axis=1)
    _, sidx = jax.lax.top_k(smax, k)                        # sort2: k*w/w2
    sblocks = jnp.take(sub, sidx, axis=0)                   # (k, w2)
    v, p = jax.lax.top_k(sblocks.reshape(-1), k)            # sort3: k*w2
    bpos = jnp.take(sidx, p // w2) * w2 + p % w2            # pos in (k*w,)
    grow = jnp.take(widx, bpos // w) * w + bpos % w
    return v, grow


def select_hier2_from_wmax(scores_row, wmax, k, w2):
    """Two-level select fed a PRECOMPUTED (nw,) window-max row (s5)."""
    n = scores_row.shape[0]
    w = _INT2_WINDOW
    _, widx = jax.lax.top_k(wmax, k)
    blocks = jnp.take(scores_row.reshape(n // w, w), widx, axis=0)
    sub = blocks.reshape(k * w // w2, w2)
    smax = jnp.max(sub, axis=1)
    _, sidx = jax.lax.top_k(smax, k)
    sblocks = jnp.take(sub, sidx, axis=0)
    v, p = jax.lax.top_k(sblocks.reshape(-1), k)
    bpos = jnp.take(sidx, p // w2) * w2 + p % w2
    grow = jnp.take(widx, bpos // w) * w + bpos % w
    return v, grow


# --- sweep kernel variants ---------------------------------------------

def _kernel_nosrc(q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref, qscale_ref,
                  m_ref, scales_ref, out_ref, *, out_dtype):
    p = m_ref[:]
    b0 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x03), jnp.int8)
    b1 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x0C), jnp.int8)
    b2 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x30), jnp.int8)
    b3 = jax.lax.bitcast_convert_type(p & jnp.uint8(0xC0), jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m0 = jax.lax.dot_general(q0_ref[:], b0, dims, preferred_element_type=jnp.int32)
    m1 = jax.lax.dot_general(q1_ref[:], b1, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q2_ref[:], b2, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q3_ref[:], b3, dims, preferred_element_type=jnp.int32)
    raw = (2.0 * m0.astype(jnp.float32) + 0.5 * m1.astype(jnp.float32)
           + 0.125 * m2.astype(jnp.float32) + 0.03125 * m3.astype(jnp.float32)
           + qcorr_ref[:])
    out_ref[:] = (raw * scales_ref[:] * qscale_ref[:]).astype(out_dtype)


def _kernel_nosrc_wmax(q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref, qscale_ref,
                       m_ref, scales_ref, out_ref, wmax_ref, *, out_dtype):
    p = m_ref[:]
    b0 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x03), jnp.int8)
    b1 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x0C), jnp.int8)
    b2 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x30), jnp.int8)
    b3 = jax.lax.bitcast_convert_type(p & jnp.uint8(0xC0), jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m0 = jax.lax.dot_general(q0_ref[:], b0, dims, preferred_element_type=jnp.int32)
    m1 = jax.lax.dot_general(q1_ref[:], b1, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q2_ref[:], b2, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q3_ref[:], b3, dims, preferred_element_type=jnp.int32)
    raw = (2.0 * m0.astype(jnp.float32) + 0.5 * m1.astype(jnp.float32)
           + 0.125 * m2.astype(jnp.float32) + 0.03125 * m3.astype(jnp.float32)
           + qcorr_ref[:])
    sc = (raw * scales_ref[:] * qscale_ref[:]).astype(out_dtype)
    out_ref[:] = sc
    nq, t = sc.shape
    wmax_ref[:] = jnp.max(
        sc.astype(jnp.float32).reshape(nq, t // _INT2_WINDOW, _INT2_WINDOW), axis=2
    ).astype(out_dtype)


def sweep_nosrc(packed, scales2d, qi8, qscale, out_dtype=jnp.float32, emit_wmax=False,
                tile_n=None):
    d4, n = packed.shape
    nq = qi8.shape[0]
    tile_n = tile_n or _pick_tile_int2(n, nq, d4)
    q0, q1, q2, q3, qcorr = _int2_query_parts(qi8, d4)
    if emit_wmax:
        kernel = functools.partial(_kernel_nosrc_wmax, out_dtype=out_dtype)
        out_shape = [
            jax.ShapeDtypeStruct((nq, n), out_dtype),
            jax.ShapeDtypeStruct((nq, n // _INT2_WINDOW), out_dtype),
        ]
        out_specs = [
            pl.BlockSpec((nq, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, tile_n // _INT2_WINDOW), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
    else:
        kernel = functools.partial(_kernel_nosrc, out_dtype=out_dtype)
        out_shape = jax.ShapeDtypeStruct((nq, n), out_dtype)
        out_specs = pl.BlockSpec((nq, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, d4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d4, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * nq * n * d4,
            bytes_accessed=n * d4 + n * 4 + nq * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=False,
    )(q0, q1, q2, q3, qcorr, qscale, packed, scales2d)


# --- fine phase (production semantics) ----------------------------------

def fine_phase(coarse_vals, idx, qi8, qscale, packed4, scales4, k):
    nq, kc = idx.shape
    order = jnp.argsort(idx, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    coarse_vals = jnp.take_along_axis(coarse_vals, order, axis=1)
    cols = jnp.take(packed4, idx.reshape(-1), axis=1)
    lv = unpack_int4_xla(cols).reshape(-1, nq, kc)
    iscores = jnp.einsum("qd,dqk->qk", qi8, lv, preferred_element_type=jnp.int32)
    fine = iscores.astype(jnp.float32) * jnp.take(scales4, idx) * qscale
    fine = jnp.where(jnp.isfinite(coarse_vals.astype(jnp.float32)), fine, -jnp.inf)
    vals, perm = jax.lax.top_k(fine, k)
    return vals, jnp.take_along_axis(idx, perm, axis=1)


def make_pipeline(sweep, select):
    def run(q, p2, sc2d, s2d, p4, sc4, allowed):
        qi8, qscale = quantize_queries(q)
        out = sweep(p2, sc2d, s2d, qi8, qscale, allowed)
        if isinstance(out, (tuple, list)):
            coarse, wmax = out
            sels = [select(coarse[i], wmax[i]) for i in range(q.shape[0])]
        else:
            coarse = out
            sels = [select(coarse[i], None) for i in range(q.shape[0])]
        cv = jnp.stack([v for v, _ in sels])
        idx = jnp.stack([p for _, p in sels])
        return fine_phase(cv, idx, qi8, qscale, p4, sc4, K)
    return run


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

    sweep_prod = lambda p2, sc, s, qi8, qs, al: pallas_int2_scores(p2, sc, s, qi8, qs, al, False)
    variants = {
        "s1. hier2 w2=16": make_pipeline(sweep_prod, lambda c, _: select_hier2(c, KC, 16)),
        "s2. hier2 w2=8": make_pipeline(sweep_prod, lambda c, _: select_hier2(c, KC, 8)),
        "s3. s1+nosrc": make_pipeline(
            lambda p2, sc, s, qi8, qs, al: sweep_nosrc(p2, sc, qi8, qs),
            lambda c, _: select_hier2(c, KC, 16)),
        "s4. s3+bf16": make_pipeline(
            lambda p2, sc, s, qi8, qs, al: sweep_nosrc(p2, sc, qi8, qs, jnp.bfloat16),
            lambda c, _: select_hier2(c, KC, 16)),
        # s5 (in-kernel wmax side output) is unlowernable at tile 12288:
        # the (1, 96) wmax block violates Mosaic's 128-lane block rule.
    }

    # correctness: s1/s2/s3 must reproduce production rows EXACTLY
    q0 = queries(7, 1)[0]
    v0, r0, fl0 = jax.jit(
        lambda q, p2, sc, s, p4, sc4: scan_int2_coarse_fine(
            p2, sc[0], p4, sc4, s[0], q, allowed, K)
    )(q0, *arrays)
    r0set = set(np.asarray(r0[0]).tolist())
    for name in ("s1. hier2 w2=16", "s2. hier2 w2=8", "s3. s1+nosrc"):
        v1, r1 = jax.jit(lambda q, *a, f=variants[name]: f(q, *a, allowed))(q0, *arrays)
        assert set(np.asarray(r1[0]).tolist()) == r0set, f"{name} diverged"
        np.testing.assert_allclose(np.sort(np.asarray(v0[0])), np.sort(np.asarray(v1[0])), rtol=1e-5)
    # s4: bf16 coarse reorders near-ties; require >= 120/128 row overlap
    for name in ("s4. s3+bf16",):
        v1, r1 = jax.jit(lambda q, *a, f=variants[name]: f(q, *a, allowed))(q0, *arrays)
        ov = len(r0set & set(np.asarray(r1[0]).tolist()))
        print(f"{name}: top-{K} overlap {ov}/{K}", flush=True)
        assert ov >= K - 8, f"{name} overlap {ov}"
    print("set-checks OK", flush=True)

    def loop(r, body):
        def f(qs, *args):
            def it(i, acc):
                v, rows = body(qs[i], *args)
                return acc + jnp.sum(v.astype(jnp.float32)) + jnp.sum(rows.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f

    def marginal(label, mk, args, reps=(1, 5), iters=3):
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

    def mk_s0(r):
        def body(q, p2, sc, s, p4, sc4):
            v, rows, _ = scan_int2_coarse_fine(p2, sc[0], p4, sc4, s[0], q, allowed, K)
            return v, rows
        return loop(r, body)

    marginal("s0. production kc=4096", mk_s0, arrays)
    for name, f in variants.items():
        marginal(name, lambda r, f=f: loop(r, lambda q, *a: f(q, *a, allowed)), arrays)


if __name__ == "__main__":
    main()
