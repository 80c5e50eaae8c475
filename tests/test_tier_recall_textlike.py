"""Tier recall on TEXT-DERIVED embeddings (VERDICT r3 #5).

Every prior recall number came from synthetic gaussians; real corpora are
CLUSTERED — repeated boilerplate, overlapping windows of the same
document, topical vocabulary — exactly the regime where the int2 tier is
known fragile (BENCH_NOTES round-3 clustered2).  The image is airgapped
(no pretrained checkpoint can be downloaded; reference
scripts/install_models.sh:7-37 assumes a local clone), so this harness
builds the closest production-shaped corpus available WITHOUT weights:

* REAL text — every tracked Markdown file in the repo plus the committed
  HTML fixture pages — sliced into overlapping word windows (overlap
  manufactures the near-duplicate structure chunked ingest produces);
* embedded by the production encoder tower (random weights, fixed seed,
  production width d=384): random-feature projections of real token
  statistics preserve the text's similarity structure — near-identical
  windows land near-identical vectors, disjoint topics spread — which is
  what the tiers' quantization actually has to survive;
* served recall@10 of every quantized tier measured through the FULL
  production Searcher (coarse pass, f32 rerank, floors, escalation,
  self-audit) against the exact f32 oracle.

The assertion is the user-visible bar: served recall@10 >= 0.999 per
tier.  A demoted int2 coarse pass (the audit flagging dense ties) still
must hold the bar through its fine path — demotion is the system
working, not a test failure.
"""

import pathlib
import re

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.index.matrix import INT2, INT4
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import (
    EncoderArch,
    HeadConfig,
    Model,
    TextTokenizer,
    tiny_test_vocab,
)

REPO = pathlib.Path(__file__).resolve().parent.parent
WINDOW, STRIDE = 24, 3  # words; stride << window => near-duplicate rows


def _harvest_windows():
    words: list[str] = []
    texts = []
    for p in (
        sorted(REPO.glob("*.md"))
        + sorted((REPO / "docs").glob("*.md"))
        + sorted((REPO / "tests" / "fixtures" / "pages").glob("*.html"))
    ):
        texts.append(p.read_text(errors="replace"))
    corpus = re.sub(r"<[^>]+>", " ", " ".join(texts))
    words = re.findall(r"[a-zA-Z][a-zA-Z0-9]+", corpus.lower())
    wins = [
        " ".join(words[i : i + WINDOW])
        for i in range(0, len(words) - WINDOW, STRIDE)
    ]
    return words, wins


@pytest.fixture(scope="module")
def corpus():
    words, wins = _harvest_windows()
    assert len(wins) > 4608, "repo text shrank below the coarse-compression bar"
    wins = wins[:8192]
    # production-width tower over the real corpus vocabulary (top 2000
    # words; rarer words fall back to the char pieces)
    freq: dict[str, int] = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    vocab = tiny_test_vocab(
        [w for w, _ in sorted(freq.items(), key=lambda kv: -kv[1])[:2000]]
    )
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(
        vocab_size=len(vocab), hidden_size=384, num_layers=2, num_heads=6,
        intermediate_size=1536, max_position_embeddings=32,
    )
    model = Model.random(
        arch, HeadConfig(pooling="mean", normalize=True), tok, seed=42
    )
    emb = np.asarray(model.encode(wins), np.float32)
    # queries: perturbed mid-corpus windows (a user quoting a document),
    # held aside from no row — stored rows ARE worst-case queries
    rng = np.random.default_rng(7)
    qidx = rng.choice(len(wins), size=48, replace=False)
    q = emb[qidx] + 0.02 * rng.standard_normal((48, emb.shape[1])).astype(
        np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(q @ emb.T), axis=1, kind="stable")[:, :10]
    return emb, q, oracle


def _served_recall(tier, corpus):
    emb, q, oracle = corpus
    s = Searcher(0, 0, emb.shape[1], dtype=tier, engine="xla")
    s.upsert_embeddings(
        list(range(1, len(emb) + 1)), [0] * len(emb), emb
    )
    hit = total = 0
    for i in range(len(q)):
        got = {iid - 1 for iid, _ in s.search_vector(q[i], 10)}
        hit += len(got & set(oracle[i].tolist()))
        total += 10
    return hit / total, s


@pytest.mark.parametrize(
    "tier", [jnp.int8, INT4, INT2], ids=["int8", "int4", "int2"]
)
def test_served_recall_on_text_embeddings(tier, corpus):
    recall, s = _served_recall(tier, corpus)
    assert recall >= 0.999, f"served recall {recall} under the tier bar"
    if tier is INT2:
        # the self-audit ran on this text corpus; its verdict (trust,
        # select variant, fetch depth) is recorded — whatever it chose,
        # the bar above held THROUGH that choice
        assert s.coarse_audit is not None
        assert s.coarse_audit["queries"] > 0
