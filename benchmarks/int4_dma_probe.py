"""Discriminate: is the 34 ms int4 floor the DMA or the int8 matmul?

D1: pure DMA of (192, N) uint8 transposed blocks (touch 8x128 corner only)
D6: DMA + dot over only HALF the sublanes (96 of 192) — halves matmul work
    at constant DMA; if time ~halves the matmul is the bottleneck
D7: full dot (the P0 baseline, ~34 ms)
Run with ARG=int8 for the row-major int8 variants in a fresh process.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 10_002_432
D = 384
D2 = 192
TILE = 4096
cp = pltpu.CompilerParams(vmem_limit_bytes=20 * 1024 * 1024)


def timeit(name, fn, args_fn, nbytes):
    try:
        np.asarray(fn(*args_fn(0)))
        ts = []
        for i in range(4):
            a = args_fn(100 + i)
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{name}: {med*1e3:.2f} ms ({nbytes/med/1e9:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def dma_kernel(m_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)

    corner = m_ref[0:8, 0:128].astype(jnp.int32)
    o_ref[:] = o_ref[:] + jnp.sum(corner, axis=0, keepdims=True).astype(jnp.float32)


def dot_kernel(q_ref, m_ref, o_ref, *, rows):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)

    lo = jax.lax.bitcast_convert_type(m_ref[0:rows, :] & jnp.uint8(15), jnp.int8)
    m1 = jax.lax.dot_general(q_ref[:, 0:rows], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    o_ref[:] = jnp.maximum(o_ref[:], jnp.max(m1, axis=1, keepdims=True).astype(jnp.float32))


def main_int4():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    words = jax.random.bits(jax.random.PRNGKey(0), (D2, N // 4), jnp.uint32)
    packedT = jax.block_until_ready(jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(D2, N))
    del words

    def d1(m):
        return pl.pallas_call(
            dma_kernel, grid=(N // TILE,),
            in_specs=[pl.BlockSpec((D2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32), compiler_params=cp,
        )(m)

    timeit("D1 pure DMA uint8 (192,N)", jax.jit(d1), lambda s: (packedT,), N * D2)

    import functools
    for rows, name in ((96, "D6 half dot"), (192, "D7 full dot")):
        def dk(q, m, rows=rows):
            return pl.pallas_call(
                functools.partial(dot_kernel, rows=rows), grid=(N // TILE,),
                in_specs=[
                    pl.BlockSpec((1, D2), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32), compiler_params=cp,
            )(q, m)

        timeit(name, jax.jit(dk),
               lambda s: (jnp.asarray(rng.integers(-127, 128, (1, D2)).astype(np.int8)), packedT),
               N * D2)


def d5_kernel(q_ref, m_ref, o_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)

    m1 = jax.lax.dot_general(q_ref[:], m_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    o_ref[:] = jnp.maximum(o_ref[:], jnp.max(m1, axis=1, keepdims=True).astype(jnp.float32))


def main_int8():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # container-dtype DMA rates at CONSTANT bytes (1.92 GB): does the copy
    # path run at a per-element rate (wider dtype -> faster) or per-byte?
    for name, shape, dtype in (
        ("C-f32 (N/8,384)", (N // 8, 384), jnp.float32),
        ("C-bf16 (N/4,384)", (N // 4, 384), jnp.bfloat16),
        ("C-u8 rowmajor (N/2,384)", (N // 2, 384), jnp.uint8),
    ):
        if dtype == jnp.uint8:
            w = jax.random.bits(jax.random.PRNGKey(3), (shape[0], 96), jnp.uint32)
            arr = jax.block_until_ready(
                jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(shape)
            )
            del w
        else:
            arr = jax.block_until_ready(jax.random.normal(jax.random.PRNGKey(3), shape, dtype))
        rows = shape[0]
        tile = 4096
        while rows % tile:
            tile //= 2

        def dma(m, rows=rows, tile=tile, shape=shape):
            return pl.pallas_call(
                dma_kernel, grid=(rows // tile,),
                in_specs=[pl.BlockSpec((tile, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32), compiler_params=cp,
            )(m)

        timeit(name, jax.jit(dma), lambda s, a=arr: (a,), N * D2)
        del arr

    # full-size int8 row-major (the int8 kernel's layout)
    w8 = jax.random.bits(jax.random.PRNGKey(2), (N, D // 4), jnp.uint32)
    m8 = jax.block_until_ready(jax.lax.bitcast_convert_type(w8, jnp.uint8).reshape(N, D))
    del w8

    def d2(m):
        return pl.pallas_call(
            dma_kernel, grid=(N // TILE,),
            in_specs=[pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32), compiler_params=cp,
        )(m)

    timeit("D2 pure DMA u8 (N,384)", jax.jit(d2), lambda s: (m8,), N * D)

    def d5k(q_ref, m_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)

        m_i8 = jax.lax.bitcast_convert_type(m_ref[:], jnp.int8)
        m1 = jax.lax.dot_general(q_ref[:], m_i8, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        o_ref[:] = jnp.maximum(o_ref[:], jnp.max(m1, axis=1, keepdims=True).astype(jnp.float32))

    def d5(q, m):
        return pl.pallas_call(
            d5k, grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32), compiler_params=cp,
        )(q, m)

    timeit("D5 int8 row-major dot", jax.jit(d5),
           lambda s: (jnp.asarray(rng.integers(-127, 128, (1, D)).astype(np.int8)), m8),
           N * D)


if __name__ == "__main__":
    (main_int8 if len(sys.argv) > 1 and sys.argv[1] == "int8" else main_int4)()
