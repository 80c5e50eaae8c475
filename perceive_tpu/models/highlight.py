"""Highlight engine: find the best-matching snippet of each result document.

Algorithm parity with the reference (/root/reference/crates/perceive-core/
model/highlight.rs:23-164): tokenize each document untruncated, slide
CHUNK_SIZE-token windows with CHUNK_OVERLAP (env-tunable), keep each
window's longest run of non-special tokens (dropping windows shorter than
CHUNK_SIZE/2), batch-encode every chunk on the device (this reuses the bulk
embed path — one TPU dispatch scores all chunks of all documents), dot each
chunk against the query embedding, and map each document's argmax chunk back
to a character range of the original text.

The HF tokenizer hands back char offsets directly, so the reference's
byte-offset -> char_indices dance (highlight.rs:129-158) collapses to a
min/max over the chunk's offsets.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def _chunk_sizes() -> tuple[int, int]:
    """(CHUNK_SIZE, CHUNK_OVERLAP), env-tunable (highlight.rs:7-18)."""

    def env_int(name: str, default: int) -> int:
        try:
            return int(os.environ.get(name, ""))
        except ValueError:
            return default

    return env_int("CHUNK_SIZE", 20), env_int("CHUNK_OVERLAP", 4)


def _longest_nonspecial_run(special_mask: Sequence[int]) -> tuple[int, int]:
    """(start, length) of the longest consecutive run of non-special tokens."""
    best_start = best_len = cur_start = cur_len = 0
    for i, is_special in enumerate(special_mask):
        if not is_special:
            if cur_len == 0:
                cur_start = i
            cur_len += 1
            if cur_len > best_len:
                best_start, best_len = cur_start, cur_len
        else:
            cur_len = 0
    return best_start, best_len


def _prepare(model, documents, chunk_size, chunk_overlap, step):
    """Host-side chunking of one request's documents: (encodings,
    token chunk windows, chunk token ranges, per-doc chunk end indices)."""
    encs = model.tokenizer.encode_untruncated(list(documents))
    token_chunks: list[list[int]] = []
    chunk_token_ranges: list[tuple[int, int]] = []  # in doc-token coordinates
    doc_chunk_ends: list[int] = []
    for enc in encs:
        n = len(enc.ids)
        i = 0
        while i + chunk_overlap < n:
            end = min(i + chunk_size, n)
            start, length = _longest_nonspecial_run(enc.special_tokens_mask[i:end])
            abs_start = i + start
            abs_end = min(abs_start + length, end)
            if abs_end - abs_start >= chunk_size // 2:
                token_chunks.append(list(enc.ids[abs_start:abs_end]))
                chunk_token_ranges.append((abs_start, abs_end))
            i += step
        doc_chunk_ends.append(len(token_chunks))
    return encs, token_chunks, chunk_token_ranges, doc_chunk_ends


def _finish(documents, encs, scores, chunk_token_ranges, doc_chunk_ends):
    """Per-request argmax chunk -> char-range snippet extraction."""
    out: list[Optional[str]] = []
    start_idx = 0
    for doc_i, end_idx in enumerate(doc_chunk_ends):
        doc_scores = scores[start_idx:end_idx]
        if len(doc_scores) == 0:
            out.append(None)
            start_idx = end_idx
            continue
        best = start_idx + int(np.argmax(doc_scores))
        t0, t1 = chunk_token_ranges[best]
        offsets = [
            o for o in encs[doc_i].offsets[t0:t1] if o is not None and o != (0, 0)
        ] or [o for o in encs[doc_i].offsets[t0:t1] if o is not None]
        if not offsets:
            out.append(None)
        else:
            c0 = min(o[0] for o in offsets)
            c1 = max(o[1] for o in offsets)
            out.append(documents[doc_i][c0:c1])
        start_idx = end_idx
    return out


def highlight_batch(
    model,
    pairs: Sequence[tuple[str, Sequence[str]]],
    query_embs: Optional[Sequence] = None,
) -> list[list[Optional[str]]]:
    """Many (query, documents) highlight requests through ONE device batch.

    All requests' chunk windows — and each request's query, unless its
    ``query_embs`` entry is supplied — concatenate into a single bucketed
    encode, so N concurrent serve queries cost one highlight dispatch
    instead of N (each dispatch costs a full tunnel RTT on remote
    deployments; this is what bounds concurrent serve QPS, BENCH_NOTES
    round 3)."""
    chunk_size, chunk_overlap = _chunk_sizes()
    step = max(chunk_size - chunk_overlap, 1)
    if query_embs is None:
        query_embs = [None] * len(pairs)

    prepared = []
    to_encode: list[list[int]] = []
    for (query, documents), qemb in zip(pairs, query_embs):
        if not documents:
            prepared.append(None)
            continue
        encs, chunks, ranges, ends = _prepare(
            model, documents, chunk_size, chunk_overlap, step
        )
        chunk_base = len(to_encode)
        to_encode.extend(chunks)
        q_idx = -1
        if chunks and qemb is None:
            # the query rides the shared batch as one more token window
            qenc = model.tokenizer.encode_untruncated([query])[0]
            q_idx = len(to_encode)
            to_encode.append(
                [i for i, m in zip(qenc.ids, qenc.special_tokens_mask) if not m]
            )
        prepared.append((documents, encs, ranges, ends, chunk_base, q_idx, qemb))

    all_embs = None
    if to_encode:
        embs = []
        for s in range(0, len(to_encode), 256):
            tb = model.tokenizer.encode_token_chunks(to_encode[s : s + 256])
            embs.append(model.encode_token_batch(tb))
        all_embs = np.concatenate(embs, axis=0)

    out: list[list[Optional[str]]] = []
    for p in prepared:
        if p is None:
            out.append([])
            continue
        documents, encs, ranges, ends, base, q_idx, qemb = p
        n_chunks = ends[-1] if ends else 0
        if n_chunks:
            if qemb is None:
                qemb = all_embs[q_idx]
            scores = all_embs[base : base + n_chunks] @ qemb
        else:
            scores = np.zeros((0,), np.float32)
        out.append(_finish(documents, encs, scores, ranges, ends))
    return out


def highlight(
    model, query: str, documents: Sequence[str], query_emb=None
) -> list[Optional[str]]:
    """Best snippet per document, or None when a document yields no chunks.

    The query embeds IN THE SAME device batch as the chunks (appended as one
    more token window) unless ``query_emb`` is supplied — a separate
    `model.encode([query])` dispatch would double the device round trips of
    a warm serve query (VERDICT r2 #1)."""
    return highlight_batch(model, [(query, documents)], [query_emb])[0]
