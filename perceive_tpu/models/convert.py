"""HF / sentence-transformers checkpoint -> JAX params converter.

Replaces the reference's model tooling (scripts/install_models.sh converted HF
checkpoints to libtorch `rust_model.ot`; model.rs:68-174 loaded them).  Here a
standard sentence-transformers directory is read straight into the stacked
params pytree of perceive_tpu.models.encoder:

    <dir>/modules.json                  module chain (Transformer, Pooling, Dense?, Normalize?)
    <dir>/config.json                   transformer config
    <dir>/model.safetensors | pytorch_model.bin
    <dir>/1_Pooling/config.json         pooling flags
    <dir>/2_Dense/{config.json, model.safetensors|pytorch_model.bin}
    <dir>/sentence_bert_config.json     max_seq_length
    <dir>/tokenizer.json | vocab.txt    tokenizer (handled in tokenize.py)

Supported towers: BERT, DistilBERT, RoBERTa, ALBERT — the architectures
behind the registry's 8 model types.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from .encoder import EncoderArch, HeadConfig, Params

_PREFIXES = ("bert.", "distilbert.", "roberta.", "albert.", "model.")


def _strip_prefix(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in _PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _load_state_dict(model_dir: Path) -> dict[str, np.ndarray]:
    st = model_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return dict(load_file(str(st)))
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(str(bin_path), map_location="cpu", weights_only=True)
        return {k: _to_np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no weights (model.safetensors / pytorch_model.bin) in {model_dir}")


def arch_from_hf_config(cfg: Mapping[str, Any]) -> EncoderArch:
    """Map an HF transformer config.json to EncoderArch."""
    mt = cfg.get("model_type", "bert")
    if mt == "distilbert":
        return EncoderArch(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["dim"],
            num_layers=cfg["n_layers"],
            num_heads=cfg["n_heads"],
            intermediate_size=cfg["hidden_dim"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=0,
            layer_norm_eps=1e-12,
            pad_token_id=cfg.get("pad_token_id", 0),
            hidden_act=cfg.get("activation", "gelu"),
        )
    if mt == "albert":
        return EncoderArch(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            pad_token_id=cfg.get("pad_token_id", 0),
            shared_layers=True,
            embedding_size=cfg.get("embedding_size", cfg["hidden_size"]),
            hidden_act=cfg.get("hidden_act", "gelu_new"),
        )
    # bert / roberta share layer structure
    return EncoderArch(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        max_position_embeddings=cfg.get("max_position_embeddings", 512),
        type_vocab_size=cfg.get("type_vocab_size", 2),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        pad_token_id=cfg.get("pad_token_id", 1 if mt == "roberta" else 0),
        roberta_positions=(mt == "roberta"),
        hidden_act=cfg.get("hidden_act", "gelu"),
    )


# per-architecture key templates: ours -> theirs (with {i} layer index)
_BERT_KEYS = {
    "q_w": "encoder.layer.{i}.attention.self.query.weight",
    "q_b": "encoder.layer.{i}.attention.self.query.bias",
    "k_w": "encoder.layer.{i}.attention.self.key.weight",
    "k_b": "encoder.layer.{i}.attention.self.key.bias",
    "v_w": "encoder.layer.{i}.attention.self.value.weight",
    "v_b": "encoder.layer.{i}.attention.self.value.bias",
    "o_w": "encoder.layer.{i}.attention.output.dense.weight",
    "o_b": "encoder.layer.{i}.attention.output.dense.bias",
    "ln1_scale": "encoder.layer.{i}.attention.output.LayerNorm.weight",
    "ln1_bias": "encoder.layer.{i}.attention.output.LayerNorm.bias",
    "ffn_in_w": "encoder.layer.{i}.intermediate.dense.weight",
    "ffn_in_b": "encoder.layer.{i}.intermediate.dense.bias",
    "ffn_out_w": "encoder.layer.{i}.output.dense.weight",
    "ffn_out_b": "encoder.layer.{i}.output.dense.bias",
    "ln2_scale": "encoder.layer.{i}.output.LayerNorm.weight",
    "ln2_bias": "encoder.layer.{i}.output.LayerNorm.bias",
}

_DISTILBERT_KEYS = {
    "q_w": "transformer.layer.{i}.attention.q_lin.weight",
    "q_b": "transformer.layer.{i}.attention.q_lin.bias",
    "k_w": "transformer.layer.{i}.attention.k_lin.weight",
    "k_b": "transformer.layer.{i}.attention.k_lin.bias",
    "v_w": "transformer.layer.{i}.attention.v_lin.weight",
    "v_b": "transformer.layer.{i}.attention.v_lin.bias",
    "o_w": "transformer.layer.{i}.attention.out_lin.weight",
    "o_b": "transformer.layer.{i}.attention.out_lin.bias",
    "ln1_scale": "transformer.layer.{i}.sa_layer_norm.weight",
    "ln1_bias": "transformer.layer.{i}.sa_layer_norm.bias",
    "ffn_in_w": "transformer.layer.{i}.ffn.lin1.weight",
    "ffn_in_b": "transformer.layer.{i}.ffn.lin1.bias",
    "ffn_out_w": "transformer.layer.{i}.ffn.lin2.weight",
    "ffn_out_b": "transformer.layer.{i}.ffn.lin2.bias",
    "ln2_scale": "transformer.layer.{i}.output_layer_norm.weight",
    "ln2_bias": "transformer.layer.{i}.output_layer_norm.bias",
}

_ALBERT_KEYS = {
    "q_w": "encoder.albert_layer_groups.0.albert_layers.0.attention.query.weight",
    "q_b": "encoder.albert_layer_groups.0.albert_layers.0.attention.query.bias",
    "k_w": "encoder.albert_layer_groups.0.albert_layers.0.attention.key.weight",
    "k_b": "encoder.albert_layer_groups.0.albert_layers.0.attention.key.bias",
    "v_w": "encoder.albert_layer_groups.0.albert_layers.0.attention.value.weight",
    "v_b": "encoder.albert_layer_groups.0.albert_layers.0.attention.value.bias",
    "o_w": "encoder.albert_layer_groups.0.albert_layers.0.attention.dense.weight",
    "o_b": "encoder.albert_layer_groups.0.albert_layers.0.attention.dense.bias",
    "ln1_scale": "encoder.albert_layer_groups.0.albert_layers.0.attention.LayerNorm.weight",
    "ln1_bias": "encoder.albert_layer_groups.0.albert_layers.0.attention.LayerNorm.bias",
    "ffn_in_w": "encoder.albert_layer_groups.0.albert_layers.0.ffn.weight",
    "ffn_in_b": "encoder.albert_layer_groups.0.albert_layers.0.ffn.bias",
    "ffn_out_w": "encoder.albert_layer_groups.0.albert_layers.0.ffn_output.weight",
    "ffn_out_b": "encoder.albert_layer_groups.0.albert_layers.0.ffn_output.bias",
    "ln2_scale": "encoder.albert_layer_groups.0.albert_layers.0.full_layer_layer_norm.weight",
    "ln2_bias": "encoder.albert_layer_groups.0.albert_layers.0.full_layer_layer_norm.bias",
}


def convert_state_dict(
    state_dict: Mapping[str, Any], arch: EncoderArch, model_type: str = "bert"
) -> Params:
    """Torch/HF state dict -> stacked JAX params.

    Linear weights transpose from torch's (out, in) to our (in, out); per-layer
    tensors stack along a new leading layer axis (size 1 for ALBERT's shared
    layer, walked num_layers times by the forward's scan).
    """
    sd = _strip_prefix({k: _to_np(v) for k, v in state_dict.items()})

    if model_type == "distilbert":
        emb_prefix, keys = "embeddings.", _DISTILBERT_KEYS
    elif model_type == "albert":
        emb_prefix, keys = "embeddings.", _ALBERT_KEYS
    else:
        emb_prefix, keys = "embeddings.", _BERT_KEYS

    embed: Params = {
        "word": jnp.asarray(sd[emb_prefix + "word_embeddings.weight"], jnp.float32),
        "position": jnp.asarray(sd[emb_prefix + "position_embeddings.weight"], jnp.float32),
        "ln_scale": jnp.asarray(sd[emb_prefix + "LayerNorm.weight"], jnp.float32),
        "ln_bias": jnp.asarray(sd[emb_prefix + "LayerNorm.bias"], jnp.float32),
    }
    if arch.type_vocab_size > 0:
        embed["token_type"] = jnp.asarray(
            sd[emb_prefix + "token_type_embeddings.weight"], jnp.float32
        )
    if arch.emb_size != arch.hidden_size:
        embed["proj_w"] = jnp.asarray(sd["encoder.embedding_hidden_mapping_in.weight"], jnp.float32).T
        embed["proj_b"] = jnp.asarray(sd["encoder.embedding_hidden_mapping_in.bias"], jnp.float32)

    lp = 1 if arch.shared_layers else arch.num_layers
    layers: Params = {}
    for ours, theirs in keys.items():
        is_weight = ours.endswith("_w")
        mats = []
        for i in range(lp):
            m = np.asarray(sd[theirs.format(i=i)], np.float32)
            if is_weight:
                m = m.T  # torch Linear stores (out, in)
            mats.append(m)
        layers[ours] = jnp.asarray(np.stack(mats, axis=0))

    return {"embed": embed, "layers": layers}


def load_sentence_transformer(model_dir: str | Path):
    """Load a full sentence-transformers checkpoint directory.

    Returns (params, arch, head, max_seq_length).
    """
    model_dir = Path(model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    model_type = cfg.get("model_type", "bert")
    arch = arch_from_hf_config(cfg)
    params = convert_state_dict(_load_state_dict(model_dir), arch, model_type)

    # module chain: pooling flags — validate-or-raise, never a silent mean
    # fallback (review r3: a pooling_mode_mean_sqrt_len_tokens checkpoint
    # would load fine and embed everything wrongly)
    pooling = "mean"
    pool_cfg_path = model_dir / "1_Pooling" / "config.json"
    if pool_cfg_path.exists():
        pc = json.loads(pool_cfg_path.read_text())
        unsupported = [
            k for k, v in pc.items()
            if v and k.startswith("pooling_mode_")
            and k not in (
                "pooling_mode_cls_token",
                "pooling_mode_max_tokens",
                "pooling_mode_mean_tokens",
            )
        ]
        if unsupported:
            raise ValueError(f"unsupported pooling modes in {pool_cfg_path}: {unsupported}")
        if pc.get("pooling_mode_cls_token"):
            pooling = "cls"
        elif pc.get("pooling_mode_max_tokens"):
            pooling = "max"
        else:
            pooling = "mean"

    normalize = False
    dense_dirs: list[Path] = []
    modules_path = model_dir / "modules.json"
    if modules_path.exists():
        modules = json.loads(modules_path.read_text())
        normalize = any("Normalize" in m.get("type", "") for m in modules)
        # Dense modules resolve by their DECLARED paths — hardcoding 2_Dense
        # silently dropped a Dense at another index (review r3)
        dense_dirs = [
            model_dir / m["path"]
            for m in modules
            if "Dense" in m.get("type", "") and m.get("path")
        ]
    elif (model_dir / "2_Dense").exists():
        dense_dirs = [model_dir / "2_Dense"]
    if len(dense_dirs) > 1:
        raise ValueError(
            f"{model_dir} chains {len(dense_dirs)} Dense modules; only one is supported"
        )

    dense_dim = 0
    dense_activation = "identity"
    if dense_dirs:
        dense_dir = dense_dirs[0]
        dc = json.loads((dense_dir / "config.json").read_text())
        dense_dim = dc["out_features"]
        dense_activation = "tanh" if "Tanh" in dc.get("activation_function", "") else "identity"
        dsd = _load_state_dict(dense_dir)
        dsd = {k.removeprefix("linear."): v for k, v in dsd.items()}

    head = HeadConfig(
        pooling=pooling,
        dense_dim=dense_dim,
        dense_activation=dense_activation,
        normalize=normalize,
    )
    if dense_dim:
        params["dense"] = {
            "w": jnp.asarray(np.asarray(dsd["weight"], np.float32).T),
            "b": jnp.asarray(np.asarray(dsd["bias"], np.float32)),
        }

    max_seq = 512
    sb_cfg = model_dir / "sentence_bert_config.json"
    if sb_cfg.exists():
        max_seq = json.loads(sb_cfg.read_text()).get("max_seq_length", 512)
    # RoBERTa position ids are cumsum(mask) + pad_id, so a length-S sequence
    # indexes up to S + pad_id + 1 in a table of max_position_embeddings
    # rows (the familiar 514-row table serves 512 tokens); clamping to the
    # raw table size would let out-of-range gathers silently clamp and reuse
    # the last position embedding for the tail tokens
    pos_budget = arch.max_position_embeddings
    if arch.roberta_positions:
        pos_budget -= arch.pad_token_id + 1
    max_seq = min(max_seq, pos_budget)

    return params, arch, head, max_seq
