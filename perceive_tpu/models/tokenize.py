"""Tokenizer glue: HF `tokenizers` (Rust core) on the host, with bucketed
padding for XLA shape stability.

Role of the reference's rust_tokenizers wrapper (/root/reference/crates/
perceive-core/model/tokenize.rs:9-78): truncate to max_seq_length, pad, build
attention masks as ``id != pad``.  The reference padded to the longest item in
each batch (fine for libtorch's dynamic shapes); under jit every new shape is
a recompile, so we pad sequence length up to a fixed bucket ladder and keep
batch size fixed per call site.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
from tokenizers import Tokenizer
from tokenizers.models import WordPiece
from tokenizers.normalizers import BertNormalizer
from tokenizers.pre_tokenizers import BertPreTokenizer
from tokenizers.processors import TemplateProcessing

# Sequence-length buckets: every batch is padded up to the smallest bucket
# >= its longest row, so jit sees a handful of shapes instead of hundreds.
SEQ_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512)


def bucket_length(n: int, max_seq_length: int) -> int:
    for b in SEQ_BUCKETS:
        if b >= n and b <= max_seq_length:
            return b
    return max_seq_length


@dataclasses.dataclass
class TokenBatch:
    """Device-ready token arrays (all int32, shape (B, S))."""

    input_ids: np.ndarray
    attention_mask: np.ndarray
    token_type_ids: np.ndarray

    def __len__(self) -> int:
        return self.input_ids.shape[0]


class TextTokenizer:
    """Thread-safe wrapper around a `tokenizers.Tokenizer`.

    The HF Rust tokenizer's truncation/padding setters take &mut self and
    conflict with in-flight encodes (RuntimeError: Already borrowed), and one
    thread's no_truncation would leak into another's encode — so every
    encode path serializes on a lock (serve's ThreadingHTTPServer and the
    pipeline's reader threads hit this concurrently)."""

    def __init__(self, tokenizer: Tokenizer, max_seq_length: int = 512, pad_id: int = 0):
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.pad_id = pad_id
        self._lock = threading.Lock()

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_dir(cls, model_dir: str | Path, max_seq_length: int = 512) -> "TextTokenizer":
        """Load from a checkpoint dir: tokenizer.json preferred, else
        vocab.txt WordPiece (the reference's path, configs.rs:110-112)."""
        model_dir = Path(model_dir)
        tj = model_dir / "tokenizer.json"
        if tj.exists():
            tok = Tokenizer.from_file(str(tj))
        else:
            vocab_file = model_dir / "vocab.txt"
            if not vocab_file.exists():
                raise FileNotFoundError(f"no tokenizer.json or vocab.txt in {model_dir}")
            lower = True
            tc = model_dir / "tokenizer_config.json"
            if tc.exists():
                lower = json.loads(tc.read_text()).get("do_lower_case", True)
            vocab = {
                w: i for i, w in enumerate(vocab_file.read_text().splitlines())
            }
            tok = _build_wordpiece(vocab, lowercase=lower)
        # resolve the pad token across tokenizer families: explicit config
        # first (tokenizer_config.json / special_tokens_map.json both name
        # it), then the conventional spellings.  Defaulting "[PAD]"-only
        # would hand RoBERTa checkpoints ('<pad>'=1, '<s>'=0) pad_id=0 and
        # the ids-only encode path (mask = ids != pad) would silently mask
        # every sequence's BOS token.
        pad_token = None
        for cfg_name in ("tokenizer_config.json", "special_tokens_map.json"):
            cfg_file = model_dir / cfg_name
            if pad_token is None and cfg_file.exists():
                pt = json.loads(cfg_file.read_text()).get("pad_token")
                if isinstance(pt, dict):  # AddedToken serialization
                    pt = pt.get("content")
                if isinstance(pt, str):
                    pad_token = pt
        pad_id = None
        for cand in ([pad_token] if pad_token else []) + ["[PAD]", "<pad>"]:
            pad_id = tok.token_to_id(cand)
            if pad_id is not None:
                break
        return cls(tok, max_seq_length=max_seq_length, pad_id=pad_id or 0)

    @classmethod
    def from_vocab(
        cls, vocab: dict[str, int], max_seq_length: int = 512, lowercase: bool = True
    ) -> "TextTokenizer":
        """Build a BERT-style WordPiece tokenizer in memory (tests/fixtures)."""
        tok = _build_wordpiece(vocab, lowercase=lowercase)
        return cls(tok, max_seq_length=max_seq_length, pad_id=vocab.get("[PAD]", 0))

    # -- encoding ------------------------------------------------------------

    def encode_batch(
        self,
        texts: Sequence[str],
        *,
        pad_to: Optional[int] = None,
        pad_batch_to: Optional[int] = None,
    ) -> TokenBatch:
        """Tokenize + truncate to max_seq_length + pad to a bucket.

        ``pad_to`` forces a specific padded length (must be >= longest row);
        ``pad_batch_to`` right-pads the batch with empty rows to a fixed batch
        size (mask all-zero) — both keep jit shapes stable.
        """
        with self._lock:
            self.tokenizer.enable_truncation(self.max_seq_length)
            self.tokenizer.no_padding()
            # encode_batch_fast skips offset/word alignments we never read
            # here (~15% less tokenizer CPU; the host is single-core in the
            # serving containers, so tokenizer CPU is ingest throughput)
            enc = getattr(self.tokenizer, "encode_batch_fast", self.tokenizer.encode_batch)
            encs = enc(list(texts))
        if pad_batch_to is not None and len(encs) > pad_batch_to:
            raise ValueError(f"{len(encs)} texts exceed pad_batch_to={pad_batch_to}")
        longest = max((len(e.ids) for e in encs), default=1)
        if pad_to is not None and pad_to < longest:
            raise ValueError(f"pad_to={pad_to} is shorter than the longest row ({longest})")
        target = pad_to or bucket_length(longest, self.max_seq_length)

        n = len(encs) if pad_batch_to is None else pad_batch_to
        ids = np.full((n, target), self.pad_id, dtype=np.int32)
        mask = np.zeros((n, target), dtype=np.int32)
        type_ids = np.zeros((n, target), dtype=np.int32)
        for r, e in enumerate(encs):
            L = min(len(e.ids), target)
            ids[r, :L] = e.ids[:L]
            mask[r, :L] = 1
            type_ids[r, :L] = e.type_ids[:L]
        return TokenBatch(ids, mask, type_ids)

    def encode_batch_ids(
        self, texts: Sequence[str], *, pad_batch_to: Optional[int] = None
    ) -> np.ndarray:
        """Tokenize to a padded (N, S) int32 id array ONLY — no attention
        mask or type ids (the ids-only encode path derives the mask on
        device as ids != pad).  Halves the host-side array work of
        ``encode_batch`` on the single-core ingest host."""
        with self._lock:
            self.tokenizer.enable_truncation(self.max_seq_length)
            self.tokenizer.no_padding()
            enc = getattr(self.tokenizer, "encode_batch_fast", self.tokenizer.encode_batch)
            encs = enc(list(texts))
        if pad_batch_to is not None and len(encs) > pad_batch_to:
            raise ValueError(f"{len(encs)} texts exceed pad_batch_to={pad_batch_to}")
        longest = max((len(e.ids) for e in encs), default=1)
        target = bucket_length(longest, self.max_seq_length)
        n = len(encs) if pad_batch_to is None else pad_batch_to
        ids = np.full((n, target), self.pad_id, dtype=np.int32)
        for r, e in enumerate(encs):
            L = min(len(e.ids), target)
            ids[r, :L] = e.ids[:L]
        return ids

    def _special_wrap(self) -> tuple[list[int], list[int]]:
        """(prefix, suffix) special-token ids around a single sequence,
        TEMPLATE-agnostic: encode a probe text with and without specials and
        split the wrap around where the content ids actually land (an
        empty-string half-split would misplace the wrap for suffix-only
        templates like XLNet's '$A [SEP] [CLS]' — review r3)."""
        if not hasattr(self, "_wrap_ids"):
            with self._lock:
                self.tokenizer.no_truncation()
                self.tokenizer.no_padding()
                wrapped = list(self.tokenizer.encode("a").ids)
                bare = list(self.tokenizer.encode("a", add_special_tokens=False).ids)
            pre = suf = None
            if bare:
                for at in range(len(wrapped) - len(bare) + 1):
                    if wrapped[at : at + len(bare)] == bare:
                        pre, suf = wrapped[:at], wrapped[at + len(bare):]
                        break
            if pre is None:  # probe didn't resolve: fall back to half-split
                ids = [t for t in wrapped if t not in bare]
                half = (len(ids) + 1) // 2
                pre, suf = ids[:half], ids[half:]
            self._wrap_ids = (pre, suf)
        return self._wrap_ids

    @property
    def wrap_budget(self) -> int:
        """Content tokens that fit one sequence after the special-token wrap
        ([CLS]/[SEP] etc.) — the natural chunk size for chunk-embedding and
        the clamp for any configured chunk_tokens (windows longer than this
        would be silently truncated by pack_token_windows)."""
        pre, suf = self._special_wrap()
        return max(self.max_seq_length - len(pre) - len(suf), 1)

    def pack_token_windows(
        self, windows: Sequence[Sequence[int]], *, pad_batch_to: Optional[int] = None
    ) -> np.ndarray:
        """Pre-sliced token-id windows (no specials) -> padded (N, S) int32
        ids with the model's special wrap re-added.  The chunk-embedding path
        uses this so a document is tokenized ONCE — windows are slices of the
        untruncated encoding, never re-tokenized text (half the tokenizer CPU
        of the round-1 text-span chunking, and boundary-exact)."""
        pre, suf = self._special_wrap()
        budget = self.wrap_budget  # the ONE budget formula (review r3)
        n = len(windows) if pad_batch_to is None else pad_batch_to
        if pad_batch_to is not None and len(windows) > pad_batch_to:
            raise ValueError(f"{len(windows)} windows exceed pad_batch_to={pad_batch_to}")
        longest = max((min(len(w), budget) for w in windows), default=1) + len(pre) + len(suf)
        target = bucket_length(longest, self.max_seq_length)
        ids = np.full((n, target), self.pad_id, dtype=np.int32)
        for r, w in enumerate(windows):
            seq = pre + list(w[:budget]) + suf
            ids[r, : len(seq)] = seq
        return ids

    def encode_untruncated(self, texts: Sequence[str], *, fast: bool = False):
        """Full-length encodings with offsets + special-token masks, for the
        highlight engine's chunking (reference model/highlight.rs:32-38 used
        a 1e6 'no truncation' limit).  ``fast=True`` skips offset/word
        alignment tracking (~15% of tokenizer CPU) for callers that read
        only ids + special_tokens_mask — the ingest chunking path, whose
        single-core host is the throughput ceiling (review r3)."""
        with self._lock:
            self.tokenizer.no_truncation()
            self.tokenizer.no_padding()
            if fast:
                enc = getattr(
                    self.tokenizer, "encode_batch_fast", self.tokenizer.encode_batch
                )
                return enc(list(texts))
            return self.tokenizer.encode_batch(list(texts))

    def encode_token_chunks(self, chunks: Sequence[Sequence[int]]) -> TokenBatch:
        """Pack pre-chunked token-id windows into a padded batch (highlight
        path; reference model/tokenize.rs:9-57 generate_token_tensors).

        The model's special wrap IS re-added (like pack_token_windows): the
        reference encoded bare token runs, which its mean-pooling highlight
        model tolerated but a cls-pooling model cannot — hidden[:, 0] would
        be an arbitrary content token, not a [CLS] sentence embedding — and
        bare runs are out-of-distribution vs the wrapped query embedding."""
        pre, suf = self._special_wrap()
        budget = self.wrap_budget  # the ONE budget formula (review r3)
        longest = max((min(len(c), budget) for c in chunks), default=1) + len(pre) + len(suf)
        target = bucket_length(longest, self.max_seq_length)
        # pad batch size to a bucket too: highlight chunk counts vary per
        # query and would otherwise compile a fresh executable per count
        from .model import batch_bucket

        n = max(batch_bucket(len(chunks)), len(chunks))
        ids = np.full((n, target), self.pad_id, dtype=np.int32)
        mask = np.zeros((n, target), dtype=np.int32)
        for r, c in enumerate(chunks):
            seq = pre + list(c)[:budget] + suf
            ids[r, : len(seq)] = seq
            mask[r, : len(seq)] = 1
        return TokenBatch(ids, mask, np.zeros_like(ids))


def _build_wordpiece(vocab: dict[str, int], lowercase: bool = True) -> Tokenizer:
    tok = Tokenizer(WordPiece(vocab, unk_token="[UNK]"))
    tok.normalizer = BertNormalizer(lowercase=lowercase)
    tok.pre_tokenizer = BertPreTokenizer()
    cls_id = vocab.get("[CLS]", 1)
    sep_id = vocab.get("[SEP]", 2)
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    return tok


def tiny_test_vocab(words: Sequence[str]) -> dict[str, int]:
    """Deterministic toy vocab for tests/fixtures: specials + whole words +
    a-z single chars as subword fallbacks."""
    vocab: dict[str, int] = {"[PAD]": 0, "[CLS]": 1, "[SEP]": 2, "[UNK]": 3, "[MASK]": 4}
    for w in words:
        for piece in (w.lower(),):
            if piece not in vocab:
                vocab[piece] = len(vocab)
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        if c not in vocab:
            vocab[c] = len(vocab)
        cont = "##" + c
        if cont not in vocab:
            vocab[cont] = len(vocab)
    return vocab
