"""Probe: 2-bit packed coarse scan + in-jit int4 rerank (round 3).

Goal: beat the int4 tier's measured 3.05 ms single-query p50 at
10,002,432 x 384 by scanning a QUARTER-byte-per-dim matrix (0.96 GB ->
~1.3 ms at the 735 GB/s HBM ceiling), recovering recall with a fused
candidate rerank over the int4 packed matrix inside the SAME jit:

    int2 scores (pallas, scores-only, no in-kernel merge)
      -> approx_max_k K=2048 over the (1, N) score row
      -> gather K columns of the (D/2, N) int4 matrix
      -> XLA unpack + int8 dot rerank -> top-128
      -> (host f32 rerank of the 128 stays as today)

Packing (all Mosaic-legal on this toolchain: uint8 `&` + same-width
bitcasts only, no shifts / sub-byte ops):
  byte[r, n] holds 4 dims r, r+D/4, r+2D/4, r+3D/4 as 2-bit crumbs.
  Planes 0-2 store crumb c in {0..3} = level (2c-3) in {-3,-1,1,3};
  plane 3 stores t = (level-1)/2 in {-2,-1,0,1} TWO'S COMPLEMENT so the
  masked byte reinterprets as int8 64*t directly:
      b0 = bitcast(b & 0x03, i8) = c0
      b1 = bitcast(b & 0x0C, i8) = 4*c1
      b2 = bitcast(b & 0x30, i8) = 16*c2
      b3 = bitcast(b & 0xC0, i8) = 64*t3
      sum_d q_d*level_d = 2*M0 + M1/2 + M2/8 + M3/32
                          - 3*(sum q0 + sum q1 + sum q2) + sum q3
  wait -- see _int2_scores: 2*(M0 + M1/4 + M2/16 + M3/64) + corr.

Usage: python benchmarks/probe_int2.py [check|sweep]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from perceive_tpu.ops.topk import (  # noqa: E402
    ALLOW_ALL,
    _source_mask,
    unpack_int4_xla,
    quantize_queries,
)

N, D = 10_002_432, 384
D4 = D // 4
D2 = D // 2
K_COARSE = 2048
K_FINE = 128
allowed_np = np.array([ALLOW_ALL] + [-9] * 15, np.int32)


# --------------------------------------------------------------------------
# kernel


def _scan_kernel_int2_scores(
    allowed_ref, q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref, qscale_ref,
    m_ref, src_ref, scales_ref, out_ref, *, n_filter,
):
    p = m_ref[:]  # (d4, TILE) uint8
    b0 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x03), jnp.int8)
    b1 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x0C), jnp.int8)
    b2 = jax.lax.bitcast_convert_type(p & jnp.uint8(0x30), jnp.int8)
    b3 = jax.lax.bitcast_convert_type(p & jnp.uint8(0xC0), jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m0 = jax.lax.dot_general(q0_ref[:], b0, dims, preferred_element_type=jnp.int32)
    m1 = jax.lax.dot_general(q1_ref[:], b1, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q2_ref[:], b2, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q3_ref[:], b3, dims, preferred_element_type=jnp.int32)
    raw = (
        2.0 * m0.astype(jnp.float32)
        + 0.5 * m1.astype(jnp.float32)
        + 0.125 * m2.astype(jnp.float32)
        + 0.03125 * m3.astype(jnp.float32)
        + qcorr_ref[:]
    )
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    out_ref[:] = jnp.where(mask, scores, -jnp.inf)


def int2_scores(packed2, scales2d, src2d, qi8, qscale, allowed, tile_n, interpret=False):
    d4, n = packed2.shape
    nq = qi8.shape[0]
    q0, q1, q2, q3 = (qi8[:, i * d4 : (i + 1) * d4] for i in range(4))
    s012 = jnp.sum(qi8[:, : 3 * d4].astype(jnp.int32), axis=1, keepdims=True)
    s3 = jnp.sum(q3.astype(jnp.int32), axis=1, keepdims=True)
    qcorr = (-3.0 * s012 + 1.0 * s3).astype(jnp.float32)
    kernel = functools.partial(_scan_kernel_int2_scores, n_filter=allowed.shape[0])
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
        interpret=interpret,
    )(allowed, q0, q1, q2, q3, qcorr, qscale, packed2, src2d, scales2d)


def _scan_kernel_int2_scores_w32(
    allowed_ref, q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref, qscale_ref,
    m_ref, src_ref, scales_ref, out_ref, *, n_filter,
):
    """Word-width mask variant: the packed matrix arrives as (D/16, TILE)
    uint32 (4 byte-rows per word, little-endian along sublanes); each mask
    is ONE uint32 `&` per 4 bytes, then a width-changing pltpu.bitcast
    expands sublanes back to (D/4, TILE) int8 for the MXU dots — 4x less
    mask ALU than the byte-width variant."""
    w = m_ref[:]  # (d16, TILE) uint32
    b0 = pltpu.bitcast(w & jnp.uint32(0x03030303), jnp.int8)
    b1 = pltpu.bitcast(w & jnp.uint32(0x0C0C0C0C), jnp.int8)
    b2 = pltpu.bitcast(w & jnp.uint32(0x30303030), jnp.int8)
    b3 = pltpu.bitcast(w & jnp.uint32(0xC0C0C0C0), jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m0 = jax.lax.dot_general(q0_ref[:], b0, dims, preferred_element_type=jnp.int32)
    m1 = jax.lax.dot_general(q1_ref[:], b1, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(q2_ref[:], b2, dims, preferred_element_type=jnp.int32)
    m3 = jax.lax.dot_general(q3_ref[:], b3, dims, preferred_element_type=jnp.int32)
    raw = (
        2.0 * m0.astype(jnp.float32)
        + 0.5 * m1.astype(jnp.float32)
        + 0.125 * m2.astype(jnp.float32)
        + 0.03125 * m3.astype(jnp.float32)
        + qcorr_ref[:]
    )
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    out_ref[:] = jnp.where(mask, scores, -jnp.inf)


def to_words(packed2):
    """(D/4, N) uint8 -> (D/16, N) uint32, 4 consecutive byte-rows per word
    little-endian (byte 4r = LSB of word r)."""
    d4, n = packed2.shape
    b = packed2.reshape(d4 // 4, 4, n).astype(np.uint32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def int2_scores_w32(words, scales2d, src2d, qi8, qscale, allowed, tile_n, interpret=False):
    d16, n = words.shape
    d4 = d16 * 4
    nq = qi8.shape[0]
    q0, q1, q2, q3 = (qi8[:, i * d4 : (i + 1) * d4] for i in range(4))
    s012 = jnp.sum(qi8[:, : 3 * d4].astype(jnp.int32), axis=1, keepdims=True)
    s3 = jnp.sum(q3.astype(jnp.int32), axis=1, keepdims=True)
    qcorr = (-3.0 * s012 + 1.0 * s3).astype(jnp.float32)
    kernel = functools.partial(_scan_kernel_int2_scores_w32, n_filter=allowed.shape[0])
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
            pl.BlockSpec((d16, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(allowed, q0, q1, q2, q3, qcorr, qscale, words, src2d, scales2d)


def int2_then_int4(coarse_fn, packed4, scales4, qi8, qscale):
    """Full fused pipeline: coarse int2 scan -> approx top-K -> int4 rerank."""
    coarse = coarse_fn()
    _, idx = jax.lax.approx_max_k(coarse, K_COARSE, recall_target=0.98)
    cols = jnp.take(packed4, idx[0], axis=1)  # (D/2, K) -- nq=1 probe
    m2 = unpack_int4_xla(cols)  # (D, K) int8
    iscores = jax.lax.dot_general(
        qi8, m2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    fine = iscores.astype(jnp.float32) * jnp.take(scales4[0], idx[0])[None, :] * qscale
    vals, perm = jax.lax.top_k(fine, K_FINE)
    return vals, jnp.take_along_axis(idx, perm, axis=1)


# --------------------------------------------------------------------------
# reference + check


def levels_ref(packed2):
    """(D, N) f32 de-quantized levels (unit scale) from the packed bytes."""
    p = packed2.astype(np.int32)
    c0 = p & 0x03
    c1 = (p & 0x0C) >> 2
    c2 = (p & 0x30) >> 4
    t3 = (p & 0xC0) >> 6
    t3 = np.where(t3 >= 2, t3 - 4, t3)
    return np.concatenate(
        [2 * c0 - 3, 2 * c1 - 3, 2 * c2 - 3, 2 * t3 + 1], axis=0
    ).astype(np.float32)


def check():
    rng = np.random.default_rng(0)
    n = 8192
    packed2 = rng.integers(0, 256, (D4, n), dtype=np.uint8)
    scales = rng.uniform(0.005, 0.02, n).astype(np.float32)
    src = np.zeros((1, n), np.int32)
    q = rng.standard_normal((2, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qi8, qscale = quantize_queries(jnp.asarray(q))
    qi8_np, qscale_np = np.asarray(qi8), np.asarray(qscale)

    want = (qi8_np.astype(np.float64) @ levels_ref(packed2)) * scales[None, :] * qscale_np

    interpret = jax.default_backend() != "tpu"
    got = np.asarray(
        int2_scores(
            jnp.asarray(packed2), jnp.asarray(scales.reshape(1, n)), jnp.asarray(src),
            qi8, qscale, jnp.asarray(allowed_np), 1024, interpret=interpret,
        )
    )
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-6))
    print(f"int2 scores max rel err: {err:.2e} (interpret={interpret})")
    assert err < 1e-4, "algebraic unpack mismatch"
    if not interpret:  # pltpu.bitcast width change needs real Mosaic
        try:
            got32 = np.asarray(
                int2_scores_w32(
                    jnp.asarray(to_words(packed2)), jnp.asarray(scales.reshape(1, n)),
                    jnp.asarray(src), qi8, qscale, jnp.asarray(allowed_np), 1024,
                )
            )
            err32 = np.max(np.abs(got32 - want) / (np.abs(want) + 1e-6))
            print(f"int2 w32 scores max rel err: {err32:.2e}")
            assert err32 < 1e-4, "w32 unpack mismatch (byte order?)"
        except Exception as e:  # noqa: BLE001
            print(f"w32 variant unavailable: {type(e).__name__}: {str(e)[:300]}")
    print("CHECK OK")


# --------------------------------------------------------------------------
# hardware sweep


def gen_packed(key, d_rows, n):
    """(d_rows, n) random uint8 on device without large intermediates."""
    parts = []
    step = n // 8
    for i in range(8):
        words = jax.random.bits(jax.random.fold_in(key, i), (d_rows, step // 4), jnp.uint32)
        parts.append(jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(d_rows, step))
    return jax.block_until_ready(jnp.concatenate(parts, axis=1))


def marginal(name, make_fn, arrays, reps=(1, 9), iters=3):
    try:
        return _marginal(name, make_fn, arrays, reps, iters)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return float("inf")


def _marginal(name, make_fn, arrays, reps, iters):
    walls = {}
    for r in reps:
        fn = jax.jit(make_fn(r))

        def queries(seed, r=r):
            q = jax.random.normal(jax.random.PRNGKey(seed), (r, 1, D), jnp.float32)
            return jax.block_until_ready(q / jnp.linalg.norm(q, axis=2, keepdims=True))

        np.asarray(fn(queries(1), *arrays))
        ts = []
        for i in range(iters):
            qs = queries(100 + 7 * i + r)
            t0 = time.perf_counter()
            np.asarray(fn(qs, *arrays))
            ts.append(time.perf_counter() - t0)
        walls[r] = float(np.median(ts))
    m = (walls[reps[1]] - walls[reps[0]]) / (reps[1] - reps[0])
    gbs = (N * D4) / m / 1e9
    print(f"{name}: marginal {m*1e3:.2f} ms  wall1 {walls[reps[0]]*1e3:.1f} ms  "
          f"({gbs:.0f} GB/s of packed int2 bytes)", flush=True)
    return m


def sweep():
    assert jax.default_backend() == "tpu", "sweep needs the TPU"
    allowed = jnp.asarray(allowed_np)
    packed2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    packed4 = gen_packed(jax.random.PRNGKey(4), D2, N)
    scales2d = jax.block_until_ready(jnp.full((1, N), 0.01, jnp.float32))
    scales4 = scales2d
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    print(f"arrays resident: int2 {N*D4/2**30:.2f} GiB + int4 {N*D2/2**30:.2f} GiB", flush=True)

    words = jax.block_until_ready(
        jnp.concatenate(
            [jnp.asarray(to_words(np.asarray(packed2[:, s : s + N // 8])))
             for s in range(0, N, N // 8)],
            axis=1,
        )
    )

    results = {}
    for tile in (8192, 12288):
        def mk_w32(r, tile=tile):
            def f(qs, w, sc2, s2):
                def it(i, acc):
                    qi8, qsc = quantize_queries(qs[i])
                    out = int2_scores_w32(w, sc2, s2, qi8, qsc, allowed, tile)
                    return acc + jnp.sum(out)
                return jax.lax.fori_loop(0, r, it, 0.0)
            return f
        results[("w32", tile)] = marginal(
            f"int2 w32 scores-only tile={tile}", mk_w32, (words, scales2d, src2d))

    def mk_scores(r, tile=12288):
        def f(qs, p2, sc2, s2):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                out = int2_scores(p2, sc2, s2, qi8, qsc, allowed, tile)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    results[("u8", 12288)] = marginal(
        "int2 u8 scores-only tile=12288", mk_scores, (packed2, scales2d, src2d))

    use_w32 = results[("w32", 8192)] < 0.95 * results[("u8", 12288)]
    best_tile = 8192 if results[("w32", 8192)] <= results[("w32", 12288)] else 12288
    print(f"full pipeline uses {'w32' if use_w32 else 'u8'} tile={best_tile}", flush=True)

    def mk_full(r):
        def f(qs, w, p2, sc2, s2, p4, sc4):
            def it(i, acc):
                qi8, qsc = quantize_queries(qs[i])
                if use_w32:
                    coarse_fn = lambda: int2_scores_w32(w, sc2, s2, qi8, qsc, allowed, best_tile)
                else:
                    coarse_fn = lambda: int2_scores(p2, sc2, s2, qi8, qsc, allowed, best_tile)
                vals, rows = int2_then_int4(coarse_fn, p4, sc4, qi8, qsc)
                return acc + jnp.sum(vals) + jnp.sum(rows.astype(jnp.float32))
            return jax.lax.fori_loop(0, r, it, 0.0)
        return f
    marginal("int2 coarse -> approx_max_k 2048 -> int4 rerank -> top128",
             mk_full, (words, packed2, scales2d, src2d, packed4, scales4))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check()
    else:
        sweep()
