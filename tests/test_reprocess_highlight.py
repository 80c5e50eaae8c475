"""Reprocess pipeline + highlight engine tests."""

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab
from perceive_tpu.sources import scan_source
from perceive_tpu.sources.reprocess import reprocess_source
from perceive_tpu.types import Source


@pytest.fixture(scope="module")
def model():
    words = "alpha beta gamma delta epsilon news title front matter body".split()
    vocab = tiny_test_vocab(words)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=32)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=2)
    m.model_id = 0
    return m


def test_reprocess_fs_front_matter(tmp_db, tmp_path, model):
    root = tmp_path / "docs"
    root.mkdir()
    (root / "a.md").write_text("---\ntitle: Alpha\n---\nalpha beta gamma\n")
    (root / "b.txt").write_text("delta epsilon news\n")
    src = add_source(tmp_db, Source(name="d", config={"type": "fs"}, location=str(root)))
    scan_source(tmp_db, model, src, embed_batch_size=4)

    # wipe a.md's extracted metadata to simulate an older process version
    with tmp_db.write() as conn:
        conn.execute("UPDATE items SET name = NULL WHERE external_id LIKE '%a.md'")

    stats, ok = reprocess_source(tmp_db, model, src, embed_batch_size=4)
    assert ok
    assert stats.scanned.value == 2
    assert stats.fetched.value >= 1  # a.md re-extracted (b.txt has no raw)
    row = tmp_db.read().execute(
        "SELECT name, content FROM items WHERE external_id LIKE '%a.md'"
    ).fetchone()
    assert row[0] == "Alpha"
    assert row[1].startswith("alpha beta")


def test_highlight_picks_matching_chunk(model):
    import os

    os.environ["CHUNK_SIZE"] = "6"
    os.environ["CHUNK_OVERLAP"] = "2"
    try:
        filler = " ".join(["delta epsilon news"] * 6)
        target = "alpha beta gamma alpha beta"
        doc = f"{filler} {target} {filler}"
        # craft a query embedding-aligned text: same words as target
        out = model.highlight("alpha beta gamma", [doc, "delta epsilon"])
    finally:
        del os.environ["CHUNK_SIZE"]
        del os.environ["CHUNK_OVERLAP"]
    assert out[0] is not None
    assert "alpha" in out[0] or "beta" in out[0]
    # snippet is a verbatim substring of the document
    assert out[0] in doc
    assert out[1] is None or out[1] in "delta epsilon"


def test_highlight_empty_and_short(model):
    assert model.highlight("q", []) == []
    out = model.highlight("alpha", ["beta"])
    assert len(out) == 1  # short doc: one chunk or None, never crashes


def test_highlight_batch_matches_sequential(model):
    """highlight_batch over many (query, docs) pairs == per-call highlight
    (the serve path coalesces concurrent requests into one device batch)."""
    from perceive_tpu.models.highlight import highlight_batch

    filler = " ".join(["delta epsilon news"] * 4)
    pairs = [
        ("alpha beta", [f"{filler} alpha beta gamma {filler}", "delta epsilon"]),
        ("delta epsilon", ["delta epsilon news body", f"alpha beta {filler}"]),
        ("gamma", []),
        ("news title", ["news title front matter", "beta"]),
    ]
    batched = highlight_batch(model, pairs)
    for (q, docs), got in zip(pairs, batched):
        want = model.highlight(q, docs)
        assert got == want, f"batch/sequential divergence for {q!r}"


def test_coalescing_batcher():
    import threading
    import time

    from perceive_tpu.utils.coalesce import CoalescingBatcher

    calls = []

    def batch_fn(items):
        calls.append(list(items))
        return [i * 2 for i in items]

    cb = CoalescingBatcher(batch_fn, window_ms=40)
    try:
        # idle single call: immediate, batch of 1
        assert cb.call(21) == 42
        assert calls[-1] == [21]
        # a burst right after coalesces into shared batches
        results = [None] * 8
        barrier = threading.Barrier(8)

        def client(i):
            barrier.wait()
            results[i] = cb.call(i)

        ts = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert results == [i * 2 for i in range(8)]
        assert len(calls) <= 4  # far fewer backend calls than requests

        # errors propagate without killing the dispatcher
        def boom(items):
            raise RuntimeError("nope")

        cb2 = CoalescingBatcher(boom, window_ms=1)
        try:
            import pytest as _pytest

            with _pytest.raises(RuntimeError):
                cb2.call(1)
        finally:
            cb2.close()
    finally:
        cb.close()
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        cb.submit(1)  # closed
