"""Fused multi-head attention Pallas kernel for the sentence encoder.

The reference ran attention inside libtorch (rust-bert BERT forward,
/root/reference/crates/perceive-core/model/worker.rs:78-106).  Here the whole
per-head attention — scores, mask, softmax, weighted sum — is one Pallas
kernel, so the (S, S) score matrix never leaves VMEM.

Design note: sentence-embedding towers cap sequence length at 512
(model/tokenize.rs:64-71), so an entire head's score row block fits in VMEM
comfortably (512x512 f32 = 1 MB).  That makes classic flash-attention K-tiling
with online softmax pure overhead at these shapes: the right TPU design is one
grid step per (batch, head) with a plain two-pass softmax, which is what this
kernel does.  Scores and softmax run in f32 for stability; both matmuls hit
the MXU in the input dtype (bf16 in production) with f32 accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    bi = pl.program_id(0)
    q = q_ref[...].reshape(q_ref.shape[2], q_ref.shape[3])  # (S, DH)
    k = k_ref[...].reshape(k_ref.shape[2], k_ref.shape[3])
    v = v_ref[...].reshape(v_ref.shape[2], v_ref.shape[3])
    # mask arrives as the full (B, S) array (a (1, S) block would violate
    # Mosaic's sublane divisibility rule, and a dynamic row load can't be
    # proven tile-aligned); pick this batch's row with a masked reduction
    mask_f = mask_ref[...].astype(jnp.float32)  # (B, S)
    b_iota = jax.lax.broadcasted_iota(jnp.int32, mask_f.shape, 0)
    row = jnp.sum(jnp.where(b_iota == bi, mask_f, 0.0), axis=0, keepdims=True)  # (1, S)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S_q, S_k)
    scores = scores * scale + (1.0 - row) * _NEG

    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S_q, DH)
    out = (acc / l).astype(o_ref.dtype)
    o_ref[...] = out.reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, mask, *, interpret: bool | None = None):
    """q/k/v: (B, S, NH, DH); mask: (B, S) 1=keep 0=pad.
    Returns (B, S, NH, DH) in q's dtype.  Drop-in for
    perceive_tpu.models.encoder._xla_attention.

    ``interpret=None`` resolves from the default backend at trace time;
    callers that run on a non-default platform (CPU mesh in a TPU-attached
    process) must pass it explicitly (Model keys attention_impl on the
    params' platform, so "pallas" only reaches here for TPU-resident data
    unless a test opts in)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, nh, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    # (B, NH, S, DH) so each grid step's block has only leading unit dims
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))

    kernel = functools.partial(_attn_kernel, scale=scale)
    head_spec = pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            head_spec,
            head_spec,
            head_spec,
            pl.BlockSpec((b, s), lambda bi, hi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=head_spec,
        out_shape=jax.ShapeDtypeStruct((b, nh, s, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * s * s * dh,
            bytes_accessed=4 * b * nh * s * dh * q.dtype.itemsize,
            transcendentals=b * nh * s * s,
        ),
        interpret=interpret,
    )(qt, kt, vt, mask)
    return out.transpose(0, 2, 1, 3)
