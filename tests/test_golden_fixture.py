"""Committed golden-vector parity (VERDICT r1 #7).

tests/fixtures/golden_st_checkpoint is a deterministic sentence-transformers
export; golden_vectors.npz holds the torch-side embeddings computed at
fixture-generation time (scripts/make_golden_fixture.py).  This pins the
whole new_pretrained stack — tokenizer, converter, encoder, pooling, dense,
normalize — against an independently-computed target WITHOUT importing torch
at test time (SURVEY.md §4's cosine > 0.999 bar, tightened).

The second test is the real-checkpoint gate: whenever an actual registry
checkpoint is installed under the model-data dir (scripts/install_models.py),
assert our encoder matches a live torch/transformers forward on REAL weights.
Skipped when no checkpoints are installed (none ship in CI).
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).resolve().parent / "fixtures"


def test_new_pretrained_matches_committed_golden():
    from perceive_tpu.models import Model

    z = np.load(FIXTURES / "golden_vectors.npz")
    model = Model.new_pretrained(
        str(FIXTURES / "golden_st_checkpoint"), compute_dtype=np.float32,
        attention_impl="xla",
    )
    assert model.dim == 32

    # tokenization itself is pinned: identical ids to generation time
    tb = model.tokenizer.encode_batch([str(s) for s in z["sentences"]])
    np.testing.assert_array_equal(tb.input_ids, z["input_ids"])
    np.testing.assert_array_equal(tb.attention_mask, z["attention_mask"])

    got = model.encode([str(s) for s in z["sentences"]])
    want = z["embeddings"]
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999, f"cosine parity broken: {cos}"
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_real_checkpoint_parity_when_installed():
    from perceive_tpu.models import Model
    from perceive_tpu.models.registry import ModelType, checkpoint_path

    installed = [(mt, checkpoint_path(mt)) for mt in ModelType]
    installed = [(mt, p) for mt, p in installed if p is not None]
    if not installed:
        pytest.skip("no pretrained checkpoints installed under model-data")

    torch = pytest.importorskip("torch")
    from transformers import AutoModel

    mt, path = installed[0]
    model = Model.new_pretrained(mt, compute_dtype=np.float32, attention_impl="xla")
    tm = AutoModel.from_pretrained(str(path)).eval()

    texts = ["semantic search for your life", "the quick brown fox", "hello"]
    got = model.encode(texts)
    tb = model.tokenizer.encode_batch(texts)
    with torch.no_grad():
        out = tm(
            input_ids=torch.tensor(tb.input_ids),
            attention_mask=torch.tensor(tb.attention_mask),
        )
        m = torch.tensor(tb.attention_mask).unsqueeze(-1).float()
        want = ((out.last_hidden_state * m).sum(1) / m.sum(1).clamp(min=1e-9)).numpy()
    # compare up to the head: pooling-only cosine (dense/normalize heads are
    # model-specific; cosine on the pooled tower output pins the weights)
    if model.head.has_dense:
        pytest.skip(f"{mt}: dense-head models compare via the fixture test")
    if model.head.normalize:
        want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.999, f"real-weight parity broken for {mt}: {cos}"
