"""TPU probe: int4 unpack strategy variants (one process, distinct inputs).

Shipped variant A (int32 unpack both planes) measured 58 GB/s — unpack-bound.
Mosaic op support on this toolchain (probed): uint8 `&` OK, uint8/int8 `>>`
FAIL, int8 sub FAIL, u8->i8 bitcast OK, int4 bitcast FAIL, int32 paths OK.

Variant H ("algebraic hi-nibble"): encode byte = (q4_lo + 8) | ((q4_hi & 15)
<< 4) so the int8 reinterpretation is x8 = lo_nib + 16*q4_hi.  Then with
lo = bitcast(p & 15):
    M1 = q_lo . lo   = A + 8*sum(q_lo)        (A = q_lo . q4_lo)
    M2 = q_hi . x8   = q_hi . lo_nib + 16*B   (B = q_hi . q4_hi)
    M3 = q_hi . lo   = q_hi . lo_nib
    score = A + B = M1 - 8*sum(q_lo) + (M2 - M3) / 16
Only `&` + bitcasts on the tile — zero cross-bitwidth converts.

Variant F (fallback): lo native, hi via int32 shift round-trip.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perceive_tpu.ops.topk import _merge_tile_topk, _source_mask

N = 10_002_432
D = 384
D2 = D // 2
KB = 128


def _kernel_h(allowed_ref, qlo_ref, qhi_ref, qcorr_ref, qscale_ref, m_ref, src_ref,
              scales_ref, vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter, d2):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    p = m_ref[:]  # (d2, tile) uint8
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


def _kernel_f(allowed_ref, qlo_ref, qhi_ref, qcorr_ref, qscale_ref, m_ref, src_ref,
              scales_ref, vals_ref, rows_ref, sc_ref, *, k, tile_n, n_filter, d2):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    p = m_ref[:]
    lo = jax.lax.bitcast_convert_type(p & jnp.uint8(15), jnp.int8)
    hi = jax.lax.shift_right_logical(p.astype(jnp.int32), 4).astype(jnp.int8)
    dims = (((1,), (0,)), ((), ()))
    m1 = jax.lax.dot_general(qlo_ref[:], lo, dims, preferred_element_type=jnp.int32)
    m2 = jax.lax.dot_general(qhi_ref[:], hi, dims, preferred_element_type=jnp.int32)
    # F encoding: BOTH nibbles biased +8 (hi stored logical) -> correction
    # folded into qcorr = -8*(sum qlo + sum qhi)
    raw = (m1 + m2).astype(jnp.float32) + qcorr_ref[:]
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    sc_ref[:] = jnp.where(mask, scores, -jnp.inf)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * tile_n, k, n_iota, k_iota)


def call_variant(kernel, packed, scales2d, src2d, qlo, qhi, qcorr, qscale, allowed, k, tile_n):
    d2, n = packed.shape
    nq = qlo.shape[0]
    kern = functools.partial(kernel, k=k, tile_n=tile_n, n_filter=allowed.shape[0], d2=d2)
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=20 * 1024 * 1024),
    )(allowed, qlo, qhi, qcorr, qscale, packed, src2d, scales2d)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    words = jax.random.bits(jax.random.PRNGKey(0), (D2, N // 4), jnp.uint32)
    packed = jax.block_until_ready(jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(D2, N))
    scales2d = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(1), (1, N), jnp.float32, 0.001, 0.01)
    )
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    allowed = jnp.asarray(np.array([-2] + [-9] * 15, np.int32))

    # correctness oracle on a small slice (host math, H encoding)
    def host_scores_h(packed_np, qlo, qhi, qcorr):
        lo = (packed_np & 15).astype(np.int32)
        x8 = packed_np.astype(np.int8).astype(np.int32)
        m1 = qlo.astype(np.int32) @ lo
        m2 = qhi.astype(np.int32) @ x8
        m3 = qhi.astype(np.int32) @ lo
        return m1 + (m2 - m3) // 16 + qcorr  # exact: m2-m3 = 16*B

    def qmake(seed, batch, variant):
        q = rng.standard_normal((batch, D)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scale = np.abs(q).max(axis=1, keepdims=True) / 127.0
        qi8 = np.clip(np.rint(q / scale), -127, 127).astype(np.int8)
        qlo, qhi = qi8[:, :D2], qi8[:, D2:]
        if variant == "h":
            qcorr = (-8.0 * qlo.sum(axis=1, keepdims=True)).astype(np.float32)
        else:
            qcorr = (-8.0 * qi8.sum(axis=1, keepdims=True)).astype(np.float32)
        return (jnp.asarray(qlo), jnp.asarray(qhi), jnp.asarray(qcorr),
                jnp.asarray(scale.astype(np.float32)))

    for name, kern, tile, variant in (("H t4096", _kernel_h, 4096, "h"),
                                      ("H t8192", _kernel_h, 8192, "h"),
                                      ("F t8192", _kernel_f, 8192, "f")):
        try:
            fn = jax.jit(functools.partial(call_variant, kern, k=KB, tile_n=tile))
            qlo, qhi, qcorr, qs = qmake(5, 1, variant)
            np.asarray(fn(packed, scales2d, src2d, qlo, qhi, qcorr, qs, allowed)[0])
            ts = []
            for i in range(5):
                qlo, qhi, qcorr, qs = qmake(100 + i, 1, variant)
                t0 = time.perf_counter()
                np.asarray(fn(packed, scales2d, src2d, qlo, qhi, qcorr, qs, allowed)[0])
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            print(f"{name}: Q=1 median {med*1e3:.2f} ms ({(N*D2+N*8)/med/1e9:.0f} GB/s)", flush=True)
            if variant == "h":
                # spot-check scores vs host oracle on first 4096 cols
                vals, rows = fn(packed, scales2d, src2d, qlo, qhi, qcorr, qs, allowed)
                pr = np.asarray(packed[:, :4096])
                hs = host_scores_h(pr, np.asarray(qlo), np.asarray(qhi), np.asarray(qcorr))
                hsf = hs.astype(np.float32) * np.asarray(scales2d)[:, :4096] * float(np.asarray(qs)[0, 0])
                r0 = np.asarray(rows)[0]
                in_first = r0[r0 < 4096]
                if len(in_first):
                    got = np.asarray(vals)[0][r0 < 4096]
                    want = hsf[0, in_first]
                    ok = np.allclose(got, want, rtol=1e-4)
                    print(f"  spot-check vs host oracle: {ok}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
