"""Regression tests for the round-3 review wave (post-highlight-cache).

Covers: legacy deep-chunk rows must not crash DB loads, the snapshot
classmethod must not silently drop an unusable delta, mid-session retier
must recompute the quantization high-water stats, the mirror spill
directory must be steerable off tmpfs, and highlight_batch must tokenize
pending queries in one batch.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from perceive_tpu.index.matrix import (
    CHUNK_STRIDE,
    EmbeddingMatrix,
    HostMirror,
    chunk_key,
    serialize_embedding,
)
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import (
    EncoderArch,
    HeadConfig,
    Model,
    TextTokenizer,
    tiny_test_vocab,
)
from perceive_tpu.db import add_source
from perceive_tpu.types import Source, SourceStatus


def _insert_item(db, source_id, ext, vec, chunk_idx=0):
    with db.write() as conn:
        cur = conn.execute(
            "INSERT INTO items (source_id, external_id, hash, content) VALUES (?,?,?,?)",
            (source_id, ext, "", f"content {ext}"),
        )
        iid = cur.lastrowid
        conn.execute(
            """INSERT INTO item_embeddings (item_id, item_index_version, embedding,
                 model_id, model_version, chunk_idx, seq)
               VALUES (?,?,?,?,?,?, (SELECT COALESCE(MAX(seq),0)+1 FROM item_embeddings))""",
            (iid, 1, serialize_embedding(vec), 0, 0, chunk_idx),
        )
    return iid


def test_legacy_deep_chunk_rows_skipped(tmp_db):
    """A database written by an older build can hold chunk_idx >=
    CHUNK_STRIDE; the load paths must skip those rows, not crash startup
    (matrix.chunk_key fails loud by design on the ingest path)."""
    src = add_source(
        tmp_db,
        Source(name="s", config={"type": "fs"}, location="/x",
               status=SourceStatus.ready(0, 0)),
    )
    rng = np.random.default_rng(0)
    ok = _insert_item(tmp_db, src.id, "ok", rng.standard_normal(16).astype(np.float32))
    deep = _insert_item(
        tmp_db, src.id, "deep", rng.standard_normal(16).astype(np.float32),
        chunk_idx=CHUNK_STRIDE + 7,
    )
    s = Searcher.build(tmp_db, 0, 0, 16, engine="xla", use_snapshot=False)
    assert chunk_key(ok) in s.matrix.row_of
    assert len(s.matrix) == 1  # deep row skipped, build survived
    # stored_embeddings (the unhide restore path) also skips the deep row
    assert [ci for ci, _ in s.stored_embeddings(tmp_db, deep)] == []


def test_load_snapshot_classmethod_rejects_unusable_delta(tmp_path):
    m = EmbeddingMatrix(16, dtype=np.float32)
    rng = np.random.default_rng(1)
    m.upsert([chunk_key(i) for i in range(1, 9)],
             [0] * 8, rng.standard_normal((8, 16)).astype(np.float32))
    snap = str(tmp_path / "s.npz")
    assert m.save_snapshot(snap) == "full"
    m.upsert([chunk_key(20)], [0], rng.standard_normal((1, 16)).astype(np.float32))
    assert m.save_snapshot(snap) == "delta"
    # a usable delta loads fine
    m2 = EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)
    assert len(m2) == 9
    # corrupt the delta: the classmethod must fail loud, not return the
    # bare base (which would silently drop the delta's rows)
    with open(snap + ".delta", "wb") as f:
        f.write(b"not a zip")
    with pytest.raises(ValueError, match="delta"):
        EmbeddingMatrix.load_snapshot(snap, dtype=np.float32)


def test_retier_recomputes_quant_stats():
    """Rows ingested in the bf16 tier never touch scale_hw/norm_hw; a
    mid-session retier to a quantized tier must recompute them from the
    mirror or the rerank escalation margin underestimates the noise."""
    m = EmbeddingMatrix(16, dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    v = rng.standard_normal((32, 16)).astype(np.float32)
    m.upsert([chunk_key(i) for i in range(1, 33)], [0] * 32, v)
    assert m.scale_hw == 0.0 and m.norm_hw == 0.0  # bf16 tier: not tracked
    m.retier(jnp.int8)
    np.testing.assert_allclose(m.scale_hw, np.abs(v).max() / 127.0, rtol=1e-6)
    np.testing.assert_allclose(
        m.norm_hw, np.linalg.norm(v, axis=1).max(), rtol=1e-6
    )
    # int8 -> int4 rescales the divisor (127 -> 7)
    from perceive_tpu.index.matrix import INT4

    m.retier(INT4)
    np.testing.assert_allclose(m.scale_hw, np.abs(v).max() / 7.0, rtol=1e-6)


def test_mirror_spill_dir_env(monkeypatch, tmp_path):
    spill = tmp_path / "spill-here"
    monkeypatch.setenv("PERCEIVE_TPU_MIRROR_DIR", str(spill))
    m = HostMirror(64, 16, ram_budget=0)  # everything spills
    assert m.is_mmap
    assert os.path.dirname(m.path) == str(spill)
    m.close()


def test_highlight_batch_single_query_tokenizer_call():
    """Pending queries (no supplied embedding) tokenize in ONE batch, like
    the miss documents do."""
    from perceive_tpu.models.highlight import highlight_batch

    vocab = tiny_test_vocab("alpha beta gamma delta".split())
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1,
                       num_heads=4, intermediate_size=64,
                       max_position_embeddings=32)
    model = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=5)

    calls = []
    orig = model.tokenizer.encode_untruncated

    def counting(texts):
        calls.append(len(texts))
        return orig(texts)

    model.tokenizer.encode_untruncated = counting
    docs = ["alpha beta gamma delta alpha beta gamma delta" for _ in range(2)]
    pairs = [("alpha beta", docs), ("gamma delta", docs), ("beta gamma", docs)]
    out = highlight_batch(model, pairs)
    assert len(out) == 3 and all(len(snips) == 2 for snips in out)
    # one call for the miss documents + one for ALL pending queries
    assert len(calls) <= 2, calls
