"""Round 4.5: bf16 coarse-score write + approx_max_k select.

Round 3 rejected bf16 scores because bf16 lax.top_k and conversions cost
+0.4 ms; approx_max_k may take bf16 natively (PartialReduce is
dtype-generic), and the select path reads the whole score row once, so
bf16 halves 80 MB of score traffic (~0.1 ms at 816 GB/s)."""
import functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from benchmarks.abmarginal import ab_interleaved_marginal, report
from benchmarks.probe_int2n import D, D4, K, N, allowed_np, gen_packed, queries
from bench import _rand_i8t
import perceive_tpu.ops.topk as tk
from perceive_tpu.ops.topk import _int2_query_parts, _source_mask, quantize_queries
from benchmarks.probe_int2_approx import _fine_phase

def _kernel_bf16(allowed_ref, q0_ref, q1_ref, q2_ref, q3_ref, qcorr_ref,
                 qscale_ref, m_ref, src_ref, scales_ref, out_ref, *, n_filter):
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
    scores = raw * scales_ref[:] * qscale_ref[:]
    mask = _source_mask(src_ref[:], allowed_ref, n_filter)
    out_ref[:] = jnp.where(mask, scores, -jnp.inf).astype(jnp.bfloat16)

def scores_bf16(packed, scales2d, src2d, qi8, qscale, allowed):
    d4, n = packed.shape
    nq = qi8.shape[0]
    tile_n = 12288
    q0, q1, q2, q3, qcorr = _int2_query_parts(qi8, d4)
    kernel = functools.partial(_kernel_bf16, n_filter=allowed.shape[0])
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
        out_shape=jax.ShapeDtypeStruct((nq, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=tk._VMEM_LIMIT),
    )(allowed, q0, q1, q2, q3, qcorr, qscale, packed, src2d, scales2d)

def body_f32(q, p2, sc, s1, m8, allowed):
    n = p2.shape[1]
    qi8, qscale = quantize_queries(q)
    coarse = tk.pallas_int2_scores(
        p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale, allowed, False, n)
    av, ai = jax.lax.approx_max_k(coarse[0], 4096, recall_target=0.98)
    v, rows = _fine_phase(av, ai, m8, sc, qi8[0], qscale[0, 0])
    return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

def body_bf16(q, p2, sc, s1, m8, allowed):
    n = p2.shape[1]
    qi8, qscale = quantize_queries(q)
    coarse = scores_bf16(p2, sc.reshape(1, n), s1.reshape(1, n), qi8, qscale, allowed)
    av, ai = jax.lax.approx_max_k(coarse[0], 4096, recall_target=0.98)
    v, rows = _fine_phase(av.astype(jnp.float32), ai, m8, sc, qi8[0], qscale[0, 0])
    return jnp.sum(v) + jnp.sum(rows.astype(jnp.float32))

def main():
    assert jax.default_backend() == "tpu"
    allowed = jnp.asarray(allowed_np)
    p2 = gen_packed(jax.random.PRNGKey(2), D4, N)
    m8 = _rand_i8t(jax.random.PRNGKey(8), D, N)
    sc = jax.block_until_ready(jnp.full((N,), 0.01, jnp.float32))
    s1 = jax.block_until_ready(jnp.zeros((N,), jnp.int32))
    print("arrays resident", flush=True)
    marg = ab_interleaved_marginal(
        {
            "f32": (body_f32, (p2, sc, s1, m8, allowed)),
            "bf16": (body_bf16, (p2, sc, s1, m8, allowed)),
        },
        queries, r=8, rounds=15,
    )
    report(marg)
    if len(marg) == 2:
        d = np.array(marg["f32"]) - np.array(marg["bf16"])
        print(f"bf16 saves: median {np.median(d)*1e3:+.3f} ms, wins {(d>0).sum()}/15")

if __name__ == "__main__":
    main()
