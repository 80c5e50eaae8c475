"""End-to-end checkpoint loading: a synthetic sentence-transformers directory
(torch weights + modules.json + pooling config + vocab.txt) loaded through
Model.new_pretrained, golden-checked against a torch reference forward."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import BertConfig, BertModel  # noqa: E402

from perceive_tpu.models import Model  # noqa: E402


def _write_checkpoint(d, with_dense: bool, normalize: bool):
    cfg = BertConfig(
        vocab_size=60, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    tm = BertModel(cfg).eval()
    (d / "config.json").write_text(json.dumps({**cfg.to_dict(), "model_type": "bert"}))
    torch.save(tm.state_dict(), d / "pytorch_model.bin")
    (d / "sentence_bert_config.json").write_text(json.dumps({"max_seq_length": 48}))

    modules = [
        {"idx": 0, "name": "0", "path": "", "type": "sentence_transformers.models.Transformer"},
        {"idx": 1, "name": "1", "path": "1_Pooling", "type": "sentence_transformers.models.Pooling"},
    ]
    pool_dir = d / "1_Pooling"
    pool_dir.mkdir()
    (pool_dir / "config.json").write_text(
        json.dumps({"pooling_mode_mean_tokens": True, "pooling_mode_cls_token": False,
                    "pooling_mode_max_tokens": False})
    )
    dense = None
    if with_dense:
        dense_dir = d / "2_Dense"
        dense_dir.mkdir()
        dense = torch.nn.Linear(32, 16)
        torch.manual_seed(1)
        torch.nn.init.normal_(dense.weight, std=0.2)
        torch.nn.init.normal_(dense.bias, std=0.2)
        torch.save({"linear.weight": dense.weight.detach(), "linear.bias": dense.bias.detach()},
                   dense_dir / "pytorch_model.bin")
        (dense_dir / "config.json").write_text(
            json.dumps({"in_features": 32, "out_features": 16,
                        "activation_function": "torch.nn.Tanh"})
        )
        modules.append({"idx": 2, "name": "2", "path": "2_Dense",
                        "type": "sentence_transformers.models.Dense"})
    if normalize:
        modules.append({"idx": 3, "name": "3", "path": "3_Normalize",
                        "type": "sentence_transformers.models.Normalize"})
    (d / "modules.json").write_text(json.dumps(modules))

    # minimal WordPiece vocab
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world", "search",
             "semantic", "the"] + list("abcdefghijklmnopqrstuvwxyz")
    (d / "vocab.txt").write_text("\n".join(words))
    (d / "tokenizer_config.json").write_text(json.dumps({"do_lower_case": True}))
    return tm, dense


def _torch_reference(tm, dense, ids, mask, normalize):
    with torch.no_grad():
        out = tm(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
        h = out.last_hidden_state
        m = torch.tensor(mask).unsqueeze(-1).float()
        emb = (h * m).sum(1) / m.sum(1).clamp(min=1e-9)
        if dense is not None:
            emb = torch.tanh(dense(emb))
        if normalize:
            emb = torch.nn.functional.normalize(emb, dim=-1)
    return emb.numpy()


@pytest.mark.parametrize("with_dense,normalize", [(False, True), (True, False)])
def test_new_pretrained_golden(tmp_path, with_dense, normalize):
    d = tmp_path / "ckpt"
    d.mkdir()
    tm, dense = _write_checkpoint(d, with_dense, normalize)
    model = Model.new_pretrained(str(d), compute_dtype=np.float32, attention_impl="xla")
    assert model.tokenizer.max_seq_length == 48
    assert model.dim == (16 if with_dense else 32)

    texts = ["hello world", "semantic search", "the world hello"]
    got = model.encode(texts)

    tb = model.tokenizer.encode_batch(texts)
    want = _torch_reference(tm, dense, tb.input_ids, tb.attention_mask, normalize)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    np.testing.assert_allclose(cos, 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_from_dir_resolves_roberta_pad_token(tmp_path):
    """Checkpoints whose pad token is '<pad>' (RoBERTa family) must not fall
    back to pad_id=0 (= '<s>'): the ids-only encode path masks on pad_id and
    would silently exclude every BOS token (review r2: tokenize.py)."""
    import json as _json

    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    from perceive_tpu.models.tokenize import TextTokenizer

    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "hello": 4, "world": 5}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    d = tmp_path / "roberta-like"
    d.mkdir()
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(_json.dumps({"pad_token": "<pad>"}))

    t = TextTokenizer.from_dir(d, max_seq_length=16)
    assert t.pad_id == 1

    # and without the config file, the '<pad>' convention is still found
    (d / "tokenizer_config.json").unlink()
    t2 = TextTokenizer.from_dir(d, max_seq_length=16)
    assert t2.pad_id == 1
