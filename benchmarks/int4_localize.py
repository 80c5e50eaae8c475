"""Localize the int4 per-row cost: strip the kernel to DMA+dot, then add
mask / dequant / merge back one at a time.  Q=1 throughout."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perceive_tpu.ops.topk import _merge_tile_topk, _source_mask

N = 10_002_432
D2 = 192
TILE = 4096
K = 128


def k_p0(q_ref, m_ref, o_ref):
    """DMA + unpack-lo + one dot + running max."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)

    lo = jax.lax.bitcast_convert_type(m_ref[:] & jnp.uint8(15), jnp.int8)
    m1 = jax.lax.dot_general(q_ref[:], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    o_ref[:] = jnp.maximum(o_ref[:], jnp.max(m1, axis=1, keepdims=True).astype(jnp.float32))


def k_p1(q_ref, m_ref, sc_ref, o_ref):
    """P0 + f32 dequant into a scratch + max over scratch."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)

    lo = jax.lax.bitcast_convert_type(m_ref[:] & jnp.uint8(15), jnp.int8)
    m1 = jax.lax.dot_general(q_ref[:], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    sc_ref[:] = m1.astype(jnp.float32) * 0.001
    o_ref[:] = jnp.maximum(o_ref[:], jnp.max(sc_ref[:], axis=1, keepdims=True))


def k_p2(q_ref, m_ref, src_ref, sc_ref, o_ref):
    """P1 + source mask."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.full(o_ref.shape, -jnp.inf, o_ref.dtype)

    lo = jax.lax.bitcast_convert_type(m_ref[:] & jnp.uint8(15), jnp.int8)
    m1 = jax.lax.dot_general(q_ref[:], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    mask = src_ref[:] >= 0
    sc_ref[:] = jnp.where(mask, m1.astype(jnp.float32) * 0.001, -jnp.inf)
    o_ref[:] = jnp.maximum(o_ref[:], jnp.max(sc_ref[:], axis=1, keepdims=True))


def k_p3(q_ref, m_ref, src_ref, vals_ref, rows_ref, sc_ref, *, k):
    """P2 + the full merge loop (rows output)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, vals_ref.dtype)
        rows_ref[:] = jnp.full(rows_ref.shape, -1, rows_ref.dtype)

    lo = jax.lax.bitcast_convert_type(m_ref[:] & jnp.uint8(15), jnp.int8)
    m1 = jax.lax.dot_general(q_ref[:], lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    mask = src_ref[:] >= 0
    sc_ref[:] = jnp.where(mask, m1.astype(jnp.float32) * 0.001, -jnp.inf)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, sc_ref.shape, 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    _merge_tile_topk(sc_ref, vals_ref, rows_ref, slice(None), t * TILE, k, n_iota, k_iota)


def main():
    print("backend:", jax.default_backend(), flush=True)
    words = jax.random.bits(jax.random.PRNGKey(0), (D2, N // 4), jnp.uint32)
    packed = jax.block_until_ready(jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(D2, N))
    src2d = jax.block_until_ready(jnp.zeros((1, N), jnp.int32))
    rng = np.random.default_rng(0)

    def qmake(seed):
        return jnp.asarray(rng.integers(-127, 128, (1, D2)).astype(np.int8))

    m_spec = pl.BlockSpec((D2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, D2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ok_spec = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=20 * 1024 * 1024)
    grid = (N // TILE,)

    runs = []
    runs.append(("P0 dot only", pl.pallas_call(
        k_p0, grid=grid, in_specs=[q_spec, m_spec], out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32), compiler_params=cp,
    ), (packed,)))
    runs.append(("P1 +dequant scratch", pl.pallas_call(
        k_p1, grid=grid, in_specs=[q_spec, m_spec], out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TILE), jnp.float32)], compiler_params=cp,
    ), (packed,)))
    runs.append(("P2 +mask", pl.pallas_call(
        k_p2, grid=grid, in_specs=[q_spec, m_spec, s_spec], out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TILE), jnp.float32)], compiler_params=cp,
    ), (packed, src2d)))
    runs.append(("P3 +merge", pl.pallas_call(
        functools.partial(k_p3, k=K), grid=grid, in_specs=[q_spec, m_spec, s_spec],
        out_specs=(ok_spec, ok_spec),
        out_shape=(jax.ShapeDtypeStruct((1, K), jnp.float32),
                   jax.ShapeDtypeStruct((1, K), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, TILE), jnp.float32)], compiler_params=cp,
    ), (packed, src2d)))

    for name, call, extra in runs:
        try:
            fn = jax.jit(lambda q, *a, call=call: call(q, *a))
            out = fn(qmake(0), *extra)
            jax.block_until_ready(out)
            np.asarray(out[0] if isinstance(out, tuple) else out)
            ts = []
            for i in range(5):
                q = jax.block_until_ready(qmake(100 + i))
                t0 = time.perf_counter()
                out = fn(q, *extra)
                np.asarray(out[0] if isinstance(out, tuple) else out)
                ts.append(time.perf_counter() - t0)
            med = float(np.median(ts))
            print(f"{name}: {med*1e3:.2f} ms ({N*D2/med/1e9:.0f} GB/s matrix bytes)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
