"""Golden tests: the JAX encoder must reproduce torch/transformers outputs
for every supported architecture (weights imported through the converter).

This replaces the reference's manual validation against rust-bert
(model.rs:1-3) with an automated parity gate, per SURVEY.md §4.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, encode_tokens, tiny_test_vocab
from perceive_tpu.models.convert import arch_from_hf_config, convert_state_dict

RTOL, ATOL = 2e-4, 2e-4


def _rand_tokens(rng, batch, seq, vocab, pad_id=0):
    ids = rng.integers(5, vocab, size=(batch, seq)).astype(np.int32)
    lengths = rng.integers(3, seq + 1, size=batch)
    mask = (np.arange(seq)[None, :] < lengths[:, None]).astype(np.int32)
    ids = np.where(mask == 1, ids, pad_id)
    return ids, mask


def _jax_out(params, arch, ids, mask, type_ids=None, pooling="mean", normalize=False):
    head = HeadConfig(pooling=pooling, normalize=normalize)
    return np.asarray(
        encode_tokens(
            params, arch, head, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(type_ids) if type_ids is not None else None,
        )
    )


def _torch_mean_pool(last_hidden, mask):
    m = torch.tensor(mask, dtype=torch.float32).unsqueeze(-1)
    return (last_hidden * m).sum(1) / m.sum(1).clamp(min=1e-9)


def test_bert_parity():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
    )
    torch.manual_seed(0)
    tm = BertModel(cfg).eval()
    arch = arch_from_hf_config(cfg.to_dict())
    params = convert_state_dict(tm.state_dict(), arch, "bert")

    rng = np.random.default_rng(1)
    ids, mask = _rand_tokens(rng, 4, 16, cfg.vocab_size)
    type_ids = np.zeros_like(ids)

    with torch.no_grad():
        ref = tm(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(type_ids, dtype=torch.long),
        ).last_hidden_state
        ref_pooled = _torch_mean_pool(ref, mask).numpy()

    ours = _jax_out(params, arch, ids, mask, type_ids)
    np.testing.assert_allclose(ours, ref_pooled, rtol=RTOL, atol=ATOL)


def test_distilbert_parity():
    from transformers import DistilBertConfig, DistilBertModel

    cfg = DistilBertConfig(
        vocab_size=100, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    tm = DistilBertModel(cfg).eval()
    arch = arch_from_hf_config(cfg.to_dict())
    assert arch.type_vocab_size == 0
    params = convert_state_dict(tm.state_dict(), arch, "distilbert")

    rng = np.random.default_rng(2)
    ids, mask = _rand_tokens(rng, 3, 12, cfg.vocab_size)
    with torch.no_grad():
        ref = tm(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
        ref_pooled = _torch_mean_pool(ref, mask).numpy()

    ours = _jax_out(params, arch, ids, mask)
    np.testing.assert_allclose(ours, ref_pooled, rtol=RTOL, atol=ATOL)


def test_roberta_parity():
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=66, type_vocab_size=1,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    tm = RobertaModel(cfg, add_pooling_layer=False).eval()
    arch = arch_from_hf_config(cfg.to_dict())
    assert arch.roberta_positions
    params = convert_state_dict(tm.state_dict(), arch, "roberta")

    rng = np.random.default_rng(3)
    ids, mask = _rand_tokens(rng, 3, 10, cfg.vocab_size, pad_id=1)
    with torch.no_grad():
        ref = tm(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
        ref_pooled = _torch_mean_pool(ref, mask).numpy()

    ours = _jax_out(params, arch, ids, mask, np.zeros_like(ids))
    np.testing.assert_allclose(ours, ref_pooled, rtol=RTOL, atol=ATOL)


def test_albert_parity_shared_layers_and_factorized_embedding():
    from transformers import AlbertConfig, AlbertModel

    cfg = AlbertConfig(
        vocab_size=100, embedding_size=16, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    tm = AlbertModel(cfg, add_pooling_layer=False).eval()
    arch = arch_from_hf_config(cfg.to_dict())
    assert arch.shared_layers and arch.emb_size == 16
    params = convert_state_dict(tm.state_dict(), arch, "albert")

    rng = np.random.default_rng(4)
    ids, mask = _rand_tokens(rng, 2, 14, cfg.vocab_size)
    with torch.no_grad():
        ref = tm(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
        ref_pooled = _torch_mean_pool(ref, mask).numpy()

    ours = _jax_out(params, arch, ids, mask, np.zeros_like(ids))
    np.testing.assert_allclose(ours, ref_pooled, rtol=RTOL, atol=ATOL)


def test_normalize_head():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=80, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32,
    )
    torch.manual_seed(1)
    tm = BertModel(cfg).eval()
    arch = arch_from_hf_config(cfg.to_dict())
    params = convert_state_dict(tm.state_dict(), arch, "bert")
    ids, mask = _rand_tokens(np.random.default_rng(5), 3, 8, cfg.vocab_size)
    out = _jax_out(params, arch, ids, mask, np.zeros_like(ids), normalize=True)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    vocab = tiny_test_vocab(["hello", "world", "semantic", "search", "tpu", "the", "quick"])
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(
        vocab_size=len(vocab), hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=32,
    )
    head = HeadConfig(pooling="mean", normalize=True)
    return Model.random(arch, head, tok, seed=0)


def test_model_encode_end_to_end(tiny_model):
    out = tiny_model.encode(["hello world", "semantic search on tpu", "the quick"])
    assert out.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # deterministic across calls and batch layouts
    single = tiny_model.encode(["semantic search on tpu"])
    np.testing.assert_allclose(out[1], single[0], rtol=1e-4, atol=1e-5)


def test_model_encode_empty(tiny_model):
    assert tiny_model.encode([]).shape == (0, 32)


def test_tokenizer_bucketing(tiny_model):
    tb = tiny_model.tokenizer.encode_batch(["hello", "hello world semantic search"])
    assert tb.input_ids.shape[1] == 16  # smallest bucket
    assert tb.attention_mask[0].sum() < tb.attention_mask[1].sum()
    tb2 = tiny_model.tokenizer.encode_batch(["hello"], pad_batch_to=8)
    assert tb2.input_ids.shape[0] == 8
    assert tb2.attention_mask[1:].sum() == 0


def test_dense_head():
    """Optional dense projection head (DistilUSE-style 2_Dense module):
    emb -> tanh(emb @ W + b), applied after pooling, before normalize."""
    import jax

    from perceive_tpu.models.encoder import init_params, output_dim

    arch = EncoderArch(
        vocab_size=60, hidden_size=16, num_layers=1, num_heads=2,
        intermediate_size=32, max_position_embeddings=16,
    )
    base_head = HeadConfig(pooling="mean")
    dense_head = HeadConfig(pooling="mean", dense_dim=8, dense_activation="tanh")
    assert output_dim(arch, dense_head) == 8

    params = init_params(jax.random.PRNGKey(3), arch, dense_head)
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 60, (2, 8)).astype(np.int32)
    mask = np.ones_like(ids)

    pooled = np.asarray(encode_tokens(
        {k: v for k, v in params.items() if k != "dense"},
        arch, base_head, ids, mask, np.zeros_like(ids),
    ))
    want = np.tanh(pooled @ np.asarray(params["dense"]["w"]) + np.asarray(params["dense"]["b"]))
    got = np.asarray(encode_tokens(params, arch, dense_head, ids, mask, np.zeros_like(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
