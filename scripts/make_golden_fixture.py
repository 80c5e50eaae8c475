"""Generate the committed golden-vector fixture (VERDICT r1 #7).

Builds a small deterministic sentence-transformers checkpoint (torch BERT +
mean pooling + dense tanh head + L2 normalize) under tests/fixtures/
golden_st_checkpoint/ and computes the torch-side embeddings of 8 fixed
sentences into tests/fixtures/golden_vectors.npz.  Both are committed, so
tests/test_golden_fixture.py pins converter+encoder+tokenizer parity WITHOUT
needing torch at test time — and independent of transformers version drift.

Run once (python scripts/make_golden_fixture.py) and commit the outputs;
re-run only when the fixture format itself must change.
"""

import json
import sys
from pathlib import Path

import numpy as np
import torch
from transformers import BertConfig, BertModel

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
CKPT = FIXTURES / "golden_st_checkpoint"

SENTENCES = [
    "hello world",
    "semantic search for your life",
    "the quick brown fox jumps over the lazy dog",
    "bread baking requires patience",
    "quantum computers factor integers",
    "solar panels convert sunlight",
    "a",
    "the the the hello hello world world world search",
]


def main() -> None:
    CKPT.mkdir(parents=True, exist_ok=True)
    cfg = BertConfig(
        vocab_size=80, hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=64, type_vocab_size=2,
    )
    torch.manual_seed(7)
    tm = BertModel(cfg).eval()
    (CKPT / "config.json").write_text(json.dumps({**cfg.to_dict(), "model_type": "bert"}))
    torch.save(tm.state_dict(), CKPT / "pytorch_model.bin")
    (CKPT / "sentence_bert_config.json").write_text(json.dumps({"max_seq_length": 48}))

    dense = torch.nn.Linear(64, 32)
    torch.manual_seed(8)
    torch.nn.init.normal_(dense.weight, std=0.2)
    torch.nn.init.normal_(dense.bias, std=0.2)
    ddir = CKPT / "2_Dense"
    ddir.mkdir(exist_ok=True)
    torch.save(
        {"linear.weight": dense.weight.detach(), "linear.bias": dense.bias.detach()},
        ddir / "pytorch_model.bin",
    )
    (ddir / "config.json").write_text(
        json.dumps({"in_features": 64, "out_features": 32,
                    "activation_function": "torch.nn.Tanh"})
    )

    pdir = CKPT / "1_Pooling"
    pdir.mkdir(exist_ok=True)
    (pdir / "config.json").write_text(
        json.dumps({"pooling_mode_mean_tokens": True, "pooling_mode_cls_token": False,
                    "pooling_mode_max_tokens": False})
    )
    (CKPT / "modules.json").write_text(json.dumps([
        {"idx": 0, "name": "0", "path": "", "type": "sentence_transformers.models.Transformer"},
        {"idx": 1, "name": "1", "path": "1_Pooling", "type": "sentence_transformers.models.Pooling"},
        {"idx": 2, "name": "2", "path": "2_Dense", "type": "sentence_transformers.models.Dense"},
        {"idx": 3, "name": "3", "path": "3_Normalize", "type": "sentence_transformers.models.Normalize"},
    ]))

    words = (
        ["[PAD]", "[CLS]", "[SEP]", "[UNK]", "[MASK]", "hello", "world", "search",
         "semantic", "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "bread", "baking", "requires", "patience", "quantum", "computers", "factor",
         "integers", "solar", "panels", "convert", "sunlight", "for", "your", "life", "a"]
        + list("abcdefghijklmnopqrstuvwxyz")
    )
    (CKPT / "vocab.txt").write_text("\n".join(words))
    (CKPT / "tokenizer_config.json").write_text(json.dumps({"do_lower_case": True}))

    # torch-side golden embeddings, tokenized with OUR tokenizer so the two
    # stacks consume identical token ids
    from perceive_tpu.models.tokenize import TextTokenizer

    tok = TextTokenizer.from_dir(CKPT, max_seq_length=48)
    tb = tok.encode_batch(SENTENCES)
    with torch.no_grad():
        out = tm(
            input_ids=torch.tensor(tb.input_ids),
            attention_mask=torch.tensor(tb.attention_mask),
            token_type_ids=torch.tensor(tb.token_type_ids),
        )
        m = torch.tensor(tb.attention_mask).unsqueeze(-1).float()
        emb = (out.last_hidden_state * m).sum(1) / m.sum(1).clamp(min=1e-9)
        emb = torch.tanh(dense(emb))
        emb = torch.nn.functional.normalize(emb, dim=-1)
    np.savez(
        FIXTURES / "golden_vectors.npz",
        sentences=np.array(SENTENCES),
        embeddings=emb.numpy().astype(np.float32),
        input_ids=tb.input_ids,
        attention_mask=tb.attention_mask,
    )
    print(f"wrote {CKPT} and golden_vectors.npz ({emb.shape})")


if __name__ == "__main__":
    main()
