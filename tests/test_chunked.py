"""Chunked long-document embedding: one vector per chunk, dedupe at search."""

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab
from perceive_tpu.sources import scan_source
from perceive_tpu.sources.pipeline import chunk_token_windows
from perceive_tpu.types import Source

WORDS = "alpha beta gamma delta epsilon zeta eta theta music pizza".split()


@pytest.fixture(scope="module")
def model():
    vocab = tiny_test_vocab(WORDS)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=16)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=16)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=7)
    m.model_id = 0
    return m


def test_chunk_token_windows(model):
    text = " ".join(WORDS * 5)  # 50 tokens
    windows = chunk_token_windows(model.tokenizer, text, 10, 2)
    assert len(windows) > 3
    # windows are id slices of the single untruncated encoding: stride 8,
    # every window within size, full coverage with the configured overlap
    enc = model.tokenizer.encode_untruncated([text])[0]
    ids = [i for i, m in zip(enc.ids, enc.special_tokens_mask) if not m]
    for w in windows:
        assert 0 < len(w) <= 10
    flat = windows[0] + [t for w in windows[1:] for t in w[2:]]  # drop overlap
    assert flat == ids
    # short doc -> single window (whole text, no specials)
    short = chunk_token_windows(model.tokenizer, "alpha beta", 10, 2)
    enc2 = model.tokenizer.encode_untruncated(["alpha beta"])[0]
    assert short == [[i for i, m in zip(enc2.ids, enc2.special_tokens_mask) if not m]]
    # dispatch packing re-adds the special wrap and pads to a bucket
    packed = model.tokenizer.pack_token_windows(short, pad_batch_to=8)
    assert packed.shape[0] == 8
    np.testing.assert_array_equal(packed[0][: len(enc2.ids)], enc2.ids)


def test_chunked_scan_and_search(tmp_db, tmp_path, model):
    docs = tmp_path / "docs"
    docs.mkdir()
    # long doc: head is music words, tail is pizza (out of truncation range
    # for max_seq_length=16 whole-doc embedding)
    head = " ".join(["music theta eta"] * 8)
    (docs / "long.txt").write_text(f"{head} pizza pizza pizza epsilon pizza")
    (docs / "short.txt").write_text("alpha beta gamma")
    src = add_source(
        tmp_db,
        Source(name="d", config={"type": "fs", "chunk_tokens": 8, "chunk_overlap": 2},
               location=str(docs)),
    )
    searcher = Searcher(0, 0, model.dim, engine="xla")
    stats, ok = scan_source(
        tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=4
    )
    assert ok and stats.added.value == 2

    # multiple chunk rows for the long doc, chunk 0 for the short one
    rows = tmp_db.read().execute(
        """SELECT items.external_id, COUNT(*) FROM item_embeddings ie
           JOIN items ON items.id = ie.item_id GROUP BY ie.item_id"""
    ).fetchall()
    counts = {r[0].split("/")[-1]: r[1] for r in rows}
    assert counts["short.txt"] == 1
    assert counts["long.txt"] >= 4
    assert len(searcher.matrix) == sum(counts.values())

    # tail-content query finds the long doc (truncated whole-doc embedding
    # could not see "pizza") and the doc appears ONCE despite many chunks
    hits = searcher.search(model, "pizza pizza", 5)
    ids = [i for i, _ in hits]
    assert len(ids) == len(set(ids))
    long_id = tmp_db.read().execute(
        "SELECT id FROM items WHERE external_id LIKE '%long.txt'"
    ).fetchone()[0]
    assert long_id in ids

    # rescan unchanged: nothing re-encoded, chunk rows stable
    stats2, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok and stats2.encoded.value == 0
    n_emb = tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
    assert n_emb == sum(counts.values())


def test_chunk_windows_capped_at_keyspace(model):
    """Windows per document cap at the chunk_idx keyspace (4096) and a
    pathological overlap cannot collapse the stride to one-token steps —
    either would silently corrupt neighbouring items' chunk keys."""
    from perceive_tpu.sources.pipeline import MAX_CHUNKS_PER_DOC, chunk_token_windows

    text = " ".join(WORDS * 1000)  # 10k tokens
    windows = chunk_token_windows(model.tokenizer, text, 2, 0)
    assert len(windows) == MAX_CHUNKS_PER_DOC
    # overlap >= window would step by 1 token (~one window per token);
    # the clamp to half the window bounds the count near 2N/chunk_tokens
    windows2 = chunk_token_windows(model.tokenizer, text, 8, 7)
    assert len(windows2) <= 2 * (10_000 // 8) + 2
    # chunk_key refuses out-of-range indices outright
    from perceive_tpu.index.matrix import chunk_key

    with pytest.raises(ValueError):
        chunk_key(1, 4096)


def test_chunking_default_on_finds_deep_match(tmp_db, tmp_path, model):
    """A source with NO chunk config chunk-embeds long documents by default
    (VERDICT r2 #6): a match deep past max_seq_length is found, which the
    reference's head-truncation (and an explicit chunk_tokens: 0) misses."""
    docs = tmp_path / "docs_default"
    docs.mkdir()
    head = " ".join(["music theta eta"] * 16)  # way past max_seq_length=16
    (docs / "deep.txt").write_text(f"{head} pizza pizza pizza pizza")
    src = add_source(
        tmp_db, Source(name="dd", config={"type": "fs"}, location=str(docs))
    )
    searcher = Searcher(0, 0, model.dim, engine="xla")
    stats, ok = scan_source(
        tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=4
    )
    assert ok and stats.added.value == 1
    # multiple chunk rows exist without any config
    n_rows = tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
    assert n_rows >= 3
    deep_id = tmp_db.read().execute("SELECT id FROM items").fetchone()[0]
    assert deep_id in [i for i, _ in searcher.search(model, "pizza pizza", 3)]

    # explicit chunk_tokens: 0 opts back into head truncation: one row only,
    # whose embedding equals the truncated whole-document encode (no pizza)
    src0 = add_source(
        tmp_db,
        Source(name="dd0", config={"type": "fs", "chunk_tokens": 0}, location=str(docs)),
    )
    s0 = Searcher(0, 0, model.dim, engine="xla")
    scan_source(tmp_db, model, src0, on_embeddings=s0.upsert_embeddings, embed_batch_size=4)
    n0 = tmp_db.read().execute(
        "SELECT COUNT(*) FROM item_embeddings ie JOIN items ON items.id = ie.item_id"
        " WHERE items.source_id = ?", (src0.id,)
    ).fetchone()[0]
    assert n0 == 1


def test_chunked_shrink_drops_stale_chunks(tmp_db, tmp_path, model):
    docs = tmp_path / "docs2"
    docs.mkdir()
    f = docs / "doc.txt"
    f.write_text(" ".join(["alpha beta gamma delta"] * 10))
    src = add_source(
        tmp_db,
        Source(name="d2", config={"type": "fs", "chunk_tokens": 8}, location=str(docs)),
    )
    searcher = Searcher(0, 0, model.dim, engine="xla")
    scan_source(tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=4)
    n_before = tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
    assert n_before > 2

    import os, time
    f.write_text("alpha beta")  # shrinks to one chunk
    os.utime(f, (time.time() + 9, time.time() + 9))
    scan_source(tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=4)
    n_after = tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
    assert n_after == 1
    assert len(searcher.matrix) == 1  # stale device chunks tombstoned

    # searcher rebuilt from DB agrees
    s2 = Searcher.build(tmp_db, 0, 0, model.dim, engine="xla", use_snapshot=False)
    assert len(s2.matrix) == 1


def test_chunked_sharded_searcher(model):
    from perceive_tpu.parallel import ShardedSearcher, make_mesh

    mesh = make_mesh(4)
    import jax.numpy as jnp

    ss = ShardedSearcher(0, 0, 8, mesh, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # item 1 has 3 chunks, items 2..4 one each
    pairs = [(1, 0), (1, 1), (1, 2), (2, 0), (3, 0), (4, 0)]
    vecs = rng.standard_normal((6, 8)).astype(np.float32)
    ss.upsert_embeddings(pairs, [0] * 6, vecs)
    hits = ss.search_vector(vecs[1], 4)
    ids = [i for i, _ in hits]
    assert ids[0] == 1 and len(ids) == len(set(ids))
    ss.remove_items([1])
    hits = ss.search_vector(vecs[1], 4)
    assert 1 not in [i for i, _ in hits]


def test_chunk_dedupe_refetches_until_k_distinct():
    """A document whose many chunks crowd the candidate buffer must not
    truncate results: the searcher re-fetches deeper until k distinct items
    (or the corpus) are found (review r2: fixed 2x over-fetch underfill)."""
    import numpy as np

    from perceive_tpu.index.searcher import Searcher

    rng = np.random.default_rng(2)
    d, k = 32, 10
    q = rng.standard_normal(d).astype(np.float32)
    q /= np.linalg.norm(q)

    s = Searcher(0, 0, d, dtype=np.float32, engine="xla")
    # one document with 40 chunks all VERY close to the query...
    chunks = q[None, :] + 0.01 * rng.standard_normal((40, d)).astype(np.float32)
    chunks /= np.linalg.norm(chunks, axis=1, keepdims=True)
    s.upsert_embeddings([(1, ci) for ci in range(40)], [0] * 40, chunks)
    # ...plus 30 other relevant single-chunk documents slightly farther
    others = q[None, :] + 0.2 * rng.standard_normal((30, d)).astype(np.float32)
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    s.upsert_embeddings(list(range(2, 32)), [0] * 30, others)

    hits = s.search_vector(q, k)
    assert len(hits) == k, f"dedupe truncated results to {len(hits)}"
    assert hits[0][0] == 1  # the chunked document leads with its best chunk
    assert len({i for i, _ in hits}) == k


def test_underfill_deepens_with_split_filter_groups():
    """A source filter spanning >MAX_SOURCE_FILTER ids runs as multiple scan
    groups.  Underfill must be judged per group BEFORE the merge: a sparse
    group's -inf padding sorts to the merged tail and used to mask a
    chunk-crowded group's full buffer, so the deepening re-fetch never fired
    and the query silently returned fewer than k items (review r3)."""
    import numpy as np

    from perceive_tpu.index.searcher import MAX_SOURCE_FILTER, Searcher

    rng = np.random.default_rng(3)
    d, k = 32, 5
    q = rng.standard_normal(d).astype(np.float32)
    q /= np.linalg.norm(q)

    s = Searcher(0, 0, d, dtype=np.float32, engine="xla")
    # source 0: a 40-chunk document crowding the buffer + 10 other docs
    chunks = q[None, :] + 0.01 * rng.standard_normal((40, d)).astype(np.float32)
    chunks /= np.linalg.norm(chunks, axis=1, keepdims=True)
    s.upsert_embeddings([(1, ci) for ci in range(40)], [0] * 40, chunks)
    others = q[None, :] + 0.2 * rng.standard_normal((10, d)).astype(np.float32)
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    s.upsert_embeddings(list(range(2, 12)), [0] * 10, others)
    # a source in the SECOND filter group holds a single (sparse) item
    far = -q + 0.1 * rng.standard_normal(d).astype(np.float32)
    s.upsert_embeddings([100], [MAX_SOURCE_FILTER], far.reshape(1, -1))

    filt = list(range(MAX_SOURCE_FILTER + 1))  # 2 groups
    hits = s.search_vector(q, k, source_ids=filt)
    assert len(hits) == k, f"split-filter underfill truncated results to {len(hits)}"
    assert hits[0][0] == 1
    assert len({i for i, _ in hits}) == k
