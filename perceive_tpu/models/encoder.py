"""TPU-native sentence-embedding encoder.

The role of the reference's rust-bert/libtorch model stack
(/root/reference/crates/perceive-core/model.rs:68-190 and
model/worker.rs:78-106: transformer forward -> pooling -> optional dense ->
optional L2 normalize), re-designed for XLA:

- purely functional: ``encode_tokens(params, arch, head, ids, mask)`` is a
  jittable function of a params pytree — no module objects on the hot path;
- transformer layers are *stacked*: every per-layer weight is one array with
  a leading layer axis, walked with ``lax.scan``.  This compiles one layer
  body instead of unrolling L copies and gives tensor-parallel sharding a
  single leaf per weight to annotate;
- attention is pluggable: "xla" (einsum + softmax, fused by XLA) or "pallas"
  (fused flash-style kernel from perceive_tpu.ops.attention);
- compute dtype is a parameter (bf16 on TPU for MXU throughput); layernorm,
  softmax and pooling accumulate in f32.

Architectures covered (the reference's 8 registry entries span these,
model/configs.rs:30-39): BERT, DistilBERT (no token types), RoBERTa
(position offset), ALBERT (factorized embedding + shared layers).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderArch:
    """Transformer-tower shape (static; safe to close over in jit)."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2  # 0 => no token-type embeddings (DistilBERT)
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # RoBERTa computes position ids as cumsum(mask) + pad_token_id; BERT uses
    # plain arange.  "roberta_positions" selects the former.
    roberta_positions: bool = False
    # ALBERT: one set of layer params reused num_layers times, plus an
    # embedding_size != hidden_size with a learned projection.
    shared_layers: bool = False
    embedding_size: int = 0  # 0 => same as hidden_size
    # "gelu" (erf, BERT/DistilBERT) or "gelu_new" (tanh approx, ALBERT)
    hidden_act: str = "gelu"

    @property
    def emb_size(self) -> int:
        return self.embedding_size or self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Sentence-embedding head: pooling -> optional dense -> optional L2 norm
    (semantics of reference model/worker.rs:78-106)."""

    pooling: str = "mean"  # mean | cls | max
    dense_dim: int = 0  # 0 => no dense layer
    dense_activation: str = "tanh"  # tanh | identity
    normalize: bool = False

    @property
    def has_dense(self) -> bool:
        return self.dense_dim > 0


def output_dim(arch: EncoderArch, head: HeadConfig) -> int:
    return head.dense_dim if head.has_dense else arch.hidden_size


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, arch: EncoderArch, head: HeadConfig) -> Params:
    """Random (truncated-normal 0.02) params with the pytree layout the
    forward pass and the HF converter both target.

    All linear weights are stored (in, out) so the forward is ``x @ w``.
    Per-layer leaves carry a leading layer axis of size 1 when
    ``arch.shared_layers`` else ``arch.num_layers``.
    """
    h, e, i = arch.hidden_size, arch.emb_size, arch.intermediate_size
    lp = 1 if arch.shared_layers else arch.num_layers
    keys = iter(jax.random.split(rng, 32))

    def tn(key, shape):
        return (jax.random.truncated_normal(key, -2, 2, shape, jnp.float32) * 0.02)

    embed: Params = {
        "word": tn(next(keys), (arch.vocab_size, e)),
        "position": tn(next(keys), (arch.max_position_embeddings, e)),
        "ln_scale": jnp.ones((e,), jnp.float32),
        "ln_bias": jnp.zeros((e,), jnp.float32),
    }
    if arch.type_vocab_size > 0:
        embed["token_type"] = tn(next(keys), (arch.type_vocab_size, e))
    if e != h:
        embed["proj_w"] = tn(next(keys), (e, h))
        embed["proj_b"] = jnp.zeros((h,), jnp.float32)

    layers: Params = {
        "q_w": tn(next(keys), (lp, h, h)),
        "q_b": jnp.zeros((lp, h), jnp.float32),
        "k_w": tn(next(keys), (lp, h, h)),
        "k_b": jnp.zeros((lp, h), jnp.float32),
        "v_w": tn(next(keys), (lp, h, h)),
        "v_b": jnp.zeros((lp, h), jnp.float32),
        "o_w": tn(next(keys), (lp, h, h)),
        "o_b": jnp.zeros((lp, h), jnp.float32),
        "ln1_scale": jnp.ones((lp, h), jnp.float32),
        "ln1_bias": jnp.zeros((lp, h), jnp.float32),
        "ffn_in_w": tn(next(keys), (lp, h, i)),
        "ffn_in_b": jnp.zeros((lp, i), jnp.float32),
        "ffn_out_w": tn(next(keys), (lp, i, h)),
        "ffn_out_b": jnp.zeros((lp, h), jnp.float32),
        "ln2_scale": jnp.ones((lp, h), jnp.float32),
        "ln2_bias": jnp.zeros((lp, h), jnp.float32),
    }

    params: Params = {"embed": embed, "layers": layers}
    if head.has_dense:
        params["dense"] = {
            "w": tn(next(keys), (h, head.dense_dim)),
            "b": jnp.zeros((head.dense_dim,), jnp.float32),
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _activation(hidden_act: str):
    """FFN activation by HF config name — validate-or-raise, never a silent
    gelu fallback (review r3: a relu/silu checkpoint would load fine and
    produce silently wrong embeddings)."""
    try:
        return {
            "gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
            "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
            "relu": jax.nn.relu,
            "silu": jax.nn.silu,
            "swish": jax.nn.silu,
        }[hidden_act]
    except KeyError:
        raise ValueError(f"unsupported hidden_act {hidden_act!r}") from None


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with f32 statistics regardless of compute dtype."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dt)


def _xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask_bias: jax.Array
) -> jax.Array:
    """Reference attention: einsum scores, f32 softmax.  q/k/v: (B,S,NH,DH);
    mask_bias: (B,1,1,S) additive."""
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dh) + mask_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# Sequence length at which the Pallas fused-attention kernel starts
# beating XLA's einsum+softmax on TPU, measured per bucket on a v5e-class
# chip (benchmarks/probe_embed.py / probe_embed2.py, interleaved in-jit
# marginals, batch sized for ~32k token-rows per case):
#
#     seq 128:  XLA 20.3k docs/s   pallas 11.5k   (XLA 1.76x)
#     seq 256:  XLA  7.7k          pallas  6.8k   (XLA 1.14x)
#     seq 384:  XLA  4.5k          pallas  4.6k   (pallas 1.03x)
#     seq 512:  XLA  2.7k          pallas  3.6k   (pallas 1.31x)
#
# Short sequences lose to the kernel's per-(batch, head) grid overhead and
# the (B,S,NH,DH)->(B,NH,S,DH) transpose round-trips; long sequences win
# because the (S, S) f32 score tensor (x B x NH) stays in VMEM instead of
# round-tripping HBM.  Each sequence bucket compiles its own program, so
# routing by the traced static length is free — impl "tpu" below.
_PALLAS_MIN_SEQ = 384


def _attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    impl: str,
) -> jax.Array:
    if impl == "tpu":
        # per-bucket routing by the measured crossover above
        impl = "pallas" if q.shape[1] >= _PALLAS_MIN_SEQ else "xla"
    if impl in ("pallas", "pallas_interpret"):
        from ..ops.attention import fused_attention

        return fused_attention(
            q, k, v, mask, interpret=True if impl == "pallas_interpret" else None
        )
    if impl != "xla":
        # an unknown impl must not silently run the XLA path — a caller who
        # asked for the kernel (or typoed) would get wrong measurements
        # with no signal (review r3; "auto"/"tpu" resolve on Model)
        raise ValueError(f"unknown attention_impl {impl!r}")
    mask_bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
    return _xla_attention(q, k, v, mask_bias)


def _encoder_layer(
    x: jax.Array,
    lp: Params,
    mask: jax.Array,
    arch: EncoderArch,
    attention_impl: str,
) -> jax.Array:
    """One post-LN transformer block on (B,S,H).

    Matmul weights/biases are cast to the activation dtype (bf16 on TPU) so
    the MXU runs at full rate and the residual carry keeps one dtype;
    layernorm params stay f32 inside the f32-statistics normalization.
    """
    b, s, h = x.shape
    nh, dh = arch.num_heads, arch.head_dim
    dt = x.dtype

    def w(name):
        return lp[name].astype(dt)

    q = (x @ w("q_w") + w("q_b")).reshape(b, s, nh, dh)
    k = (x @ w("k_w") + w("k_b")).reshape(b, s, nh, dh)
    v = (x @ w("v_w") + w("v_b")).reshape(b, s, nh, dh)
    attn = _attention(q, k, v, mask, attention_impl).reshape(b, s, h)
    x = _layer_norm(
        x + (attn @ w("o_w") + w("o_b")), lp["ln1_scale"], lp["ln1_bias"], arch.layer_norm_eps
    )

    ffn = _activation(arch.hidden_act)(x @ w("ffn_in_w") + w("ffn_in_b"))
    ffn = ffn @ w("ffn_out_w") + w("ffn_out_b")
    return _layer_norm(x + ffn, lp["ln2_scale"], lp["ln2_bias"], arch.layer_norm_eps)


def _tower(
    params: Params,
    arch: EncoderArch,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    token_type_ids: Optional[jax.Array],
    compute_dtype: jnp.dtype,
    attention_impl: str,
) -> jax.Array:
    """Embeddings + L transformer layers -> (B,S,H) hidden states."""
    embed = params["embed"]
    x = embed["word"][input_ids]

    if arch.roberta_positions:
        # RoBERTa: padding_idx-aware positions = cumsum(mask) * mask + pad_id
        pos = jnp.cumsum(attention_mask, axis=1) * attention_mask + arch.pad_token_id
    else:
        pos = jnp.arange(input_ids.shape[1])[None, :]
    x = x + embed["position"][pos]

    if arch.type_vocab_size > 0:
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = x + embed["token_type"][tt]

    x = _layer_norm(x, embed["ln_scale"], embed["ln_bias"], arch.layer_norm_eps)
    if "proj_w" in embed:  # ALBERT factorized embedding
        x = x @ embed["proj_w"] + embed["proj_b"]
    x = x.astype(compute_dtype)

    mask = attention_mask.astype(compute_dtype)
    layers = params["layers"]

    if arch.shared_layers:
        single = jax.tree.map(lambda a: a[0], layers)

        def body(h, _):
            return _encoder_layer(h, single, mask, arch, attention_impl), None

        x, _ = jax.lax.scan(body, x, None, length=arch.num_layers)
    else:

        def body(h, lp):
            return _encoder_layer(h, lp, mask, arch, attention_impl), None

        x, _ = jax.lax.scan(body, x, layers)
    return x


def pool(hidden: jax.Array, attention_mask: jax.Array, mode: str) -> jax.Array:
    """Sentence pooling over (B,S,H) -> (B,H), f32 accumulation."""
    mask = attention_mask.astype(jnp.float32)[:, :, None]
    h = hidden.astype(jnp.float32)
    if mode == "mean":
        denom = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
        return jnp.sum(h * mask, axis=1) / denom
    if mode == "cls":
        return h[:, 0, :]
    if mode == "max":
        neg = jnp.where(mask > 0, h, -jnp.inf)
        return jnp.max(neg, axis=1)
    raise ValueError(f"unknown pooling mode: {mode}")


def encode_tokens(
    params: Params,
    arch: EncoderArch,
    head: HeadConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "xla",
) -> jax.Array:
    """Token batch -> sentence embeddings (B, output_dim), f32.

    This is the whole device-side encode path; jit it with arch/head/dtype
    static (see make_encode_fn).
    """
    hidden = _tower(
        params, arch, input_ids, attention_mask, token_type_ids, compute_dtype, attention_impl
    )
    emb = pool(hidden, attention_mask, head.pooling)
    if head.has_dense:
        d = params["dense"]
        emb = emb @ d["w"].astype(jnp.float32) + d["b"].astype(jnp.float32)
        if head.dense_activation == "tanh":
            emb = jnp.tanh(emb)
    if head.normalize:
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    return emb


def make_encode_fn(
    arch: EncoderArch,
    head: HeadConfig,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    attention_impl: str = "xla",
):
    """Build the jitted encode function: (params, ids, mask[, type_ids]) ->
    (B, D) f32 embeddings."""

    @partial(jax.jit, static_argnames=())
    def fn(params, input_ids, attention_mask, token_type_ids=None):
        return encode_tokens(
            params,
            arch,
            head,
            input_ids,
            attention_mask,
            token_type_ids,
            compute_dtype=compute_dtype,
            attention_impl=attention_impl,
        )

    return fn
