"""Ingest pipeline integration tests: temp-dir fs source -> scan -> embed ->
SQLite -> searcher (SURVEY.md §4: fake connectors over temp dirs)."""

import os
import time

import numpy as np
import pytest

from perceive_tpu.db import add_source, get_source
from perceive_tpu.index.searcher import Searcher
from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab
from perceive_tpu.sources import ScanItemState, build_document, prune_missing_items, scan_source
from perceive_tpu.sources.fs import FileScanner, GlobSet, parse_front_matter
from perceive_tpu.types import Item, ItemCompareStrategy, ItemMetadata, Source


@pytest.fixture(scope="module")
def model():
    words = ["alpha", "beta", "gamma", "delta", "news", "notes", "hello", "world"]
    tok = TextTokenizer.from_vocab(tiny_test_vocab(words), max_seq_length=32)
    arch = EncoderArch(
        vocab_size=len(tiny_test_vocab(words)), hidden_size=32, num_layers=1,
        num_heads=4, intermediate_size=64, max_position_embeddings=32,
    )
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=0)
    m.model_id, m.model_version = 0, 0
    return m


def _make_tree(root):
    root.mkdir(parents=True, exist_ok=True)
    (root / "a.md").write_text("---\ntitle: Alpha Doc\nauthor: ann\n---\nalpha beta gamma\n")
    (root / "b.txt").write_text("hello world notes\n")
    sub = root / "sub"
    sub.mkdir()
    (sub / "c.md").write_text("delta news\n")
    (root / "skip.bin").write_bytes(b"\xff\xfe\x00\x01binary")
    (root / "empty.txt").write_text("   \n")
    (root / ".hidden.txt").write_text("should not appear")
    return root


def _add_fs_source(db, root, **kw):
    return add_source(
        db,
        Source(name="docs", config={"type": "fs"}, location=str(root), **kw),
    )


def test_scan_end_to_end(tmp_db, tmp_path, model):
    root = _make_tree(tmp_path / "docs")
    src = _add_fs_source(tmp_db, root)

    searcher = Searcher(0, 0, model.dim, engine="xla")
    stats, ok = scan_source(
        tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=2
    )
    assert ok
    # 3 text files indexed; binary + empty omitted; hidden skipped
    assert stats.added.value == 3
    assert stats.encoded.value == 3
    rows = tmp_db.read().execute(
        "SELECT external_id, name, author, content FROM items ORDER BY external_id"
    ).fetchall()
    assert len(rows) == 3
    by_name = {os.path.basename(r[0]): r for r in rows}
    assert by_name["a.md"][1] == "Alpha Doc"
    assert by_name["a.md"][2] == "ann"
    assert "alpha beta gamma" in by_name["a.md"][3]
    assert by_name["a.md"][3].startswith("alpha")  # front matter stripped

    # embeddings landed in SQLite and in the device matrix
    n_emb = tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
    assert n_emb == 3
    assert len(searcher.matrix) == 3

    # search round-trips
    hits = searcher.search_and_retrieve(tmp_db, model, "alpha beta", 5)
    assert hits and any("a.md" in h.item.external_id for h in hits)


def test_rescan_unchanged(tmp_db, tmp_path, model):
    root = _make_tree(tmp_path / "docs2")
    src = _add_fs_source(tmp_db, root)
    scan_source(tmp_db, model, src, embed_batch_size=4)

    stats2, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok
    assert stats2.added.value == 0
    assert stats2.changed.value == 0
    assert stats2.unchanged.value == 3
    assert stats2.encoded.value == 0  # no re-embedding of unchanged items

    # touch one file with new content + new mtime -> exactly one re-embed
    time.sleep(0.01)
    (root / "b.txt").write_text("hello world notes CHANGED\n")
    os.utime(root / "b.txt", (time.time() + 5, time.time() + 5))
    stats3, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok
    assert stats3.changed.value == 1
    assert stats3.unchanged.value == 2
    assert stats3.encoded.value == 1


def test_rescan_content_compare_same_mtime(tmp_db, tmp_path, model):
    """mtime equal but content differs: MTIME trusts mtime, CONTENT catches it."""
    root = tmp_path / "docs3"
    root.mkdir()
    f = root / "x.txt"
    f.write_text("hello world")
    src = _add_fs_source(tmp_db, root, compare_strategy=ItemCompareStrategy.MTIME)
    scan_source(tmp_db, model, src, embed_batch_size=4)

    st = f.stat()
    f.write_text("hello world beta")
    os.utime(f, (st.st_atime, st.st_mtime))  # restore mtime

    stats, _ = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert stats.unchanged.value == 1  # MTIME: equal mtime is sufficient

    src.compare_strategy = ItemCompareStrategy.MTIME_AND_CONTENT
    stats, _ = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert stats.changed.value == 1  # equal mtime still content-compared => caught
    row = tmp_db.read().execute("SELECT content FROM items WHERE external_id = ?", (str(f),)).fetchone()
    assert row[0] == "hello world beta"


def test_force_rescan(tmp_db, tmp_path, model):
    root = tmp_path / "docs4"
    root.mkdir()
    (root / "x.txt").write_text("hello world")
    src = _add_fs_source(tmp_db, root)
    scan_source(tmp_db, model, src, embed_batch_size=4)
    stats, _ = scan_source(
        tmp_db, model, src, compare_strategy=ItemCompareStrategy.FORCE, embed_batch_size=4
    )
    assert stats.changed.value == 1
    assert stats.encoded.value == 1


def test_prune_missing(tmp_db, tmp_path, model):
    root = tmp_path / "docs5"
    root.mkdir()
    (root / "keep.txt").write_text("hello")
    (root / "gone.txt").write_text("world")
    src = _add_fs_source(tmp_db, root)
    scan_source(tmp_db, model, src, embed_batch_size=4)

    (root / "gone.txt").unlink()
    src.index_version += 1
    stats, _ = scan_source(tmp_db, model, src, embed_batch_size=4)
    removed = prune_missing_items(tmp_db, src)
    assert len(removed) == 1
    n = tmp_db.read().execute("SELECT COUNT(*) FROM items").fetchone()[0]
    assert n == 1


def test_globs_and_front_matter():
    gs = GlobSet(["*.md", "docs/**/*.txt"])
    assert gs.matches("/x/y/note.md")
    assert gs.matches("docs/a/b/c.txt")
    assert not gs.matches("/x/y/note.rst")
    assert not gs.matches("other/a.txt")
    assert GlobSet([]).matches("anything/at.all")

    meta = ItemMetadata()
    body = parse_front_matter("---\nname: N\nsummary: S\n---\nBody text", meta)
    assert body == "Body text"
    assert meta.name == "N" and meta.description == "S"
    assert parse_front_matter("no front matter", meta) is None


def test_build_document():
    it = Item(content="  body  ")
    assert build_document(it) == "body"
    it2 = Item(content="body", metadata=ItemMetadata(name="T", description="D"))
    assert build_document(it2) == "T\nD\nbody"
    assert build_document(Item(content="   ")) is None


def test_gitignore(tmp_db, tmp_path, model):
    root = tmp_path / "docs6"
    root.mkdir()
    (root / ".gitignore").write_text("ignored/\n*.log\n!keep.log\n")
    (root / "a.txt").write_text("hello")
    (root / "x.log").write_text("log file")
    (root / "keep.log").write_text("kept log")
    ig = root / "ignored"
    ig.mkdir()
    (ig / "b.txt").write_text("world")
    src = _add_fs_source(tmp_db, root)
    stats, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok
    paths = {os.path.basename(r[0]) for r in tmp_db.read().execute("SELECT external_id FROM items")}
    assert paths == {"a.txt", "keep.log"}


def test_model_switch_reembeds(tmp_db, tmp_path, model):
    """Scanning under a second model id re-embeds additively: both models'
    vectors coexist keyed by (model_id, model_version) (reference
    migrations/00001_init.sql:64-72 versioning semantics)."""
    root = tmp_path / "docs7"
    root.mkdir()
    (root / "x.txt").write_text("hello world")
    src = _add_fs_source(tmp_db, root)
    scan_source(tmp_db, model, src, embed_batch_size=4)

    import copy

    model2 = copy.copy(model)
    model2.model_id = 5
    stats, ok = scan_source(tmp_db, model2, src, embed_batch_size=4)
    assert ok and stats.encoded.value == 1  # no embedding under model 5 yet

    rows = tmp_db.read().execute(
        "SELECT model_id, COUNT(*) FROM item_embeddings GROUP BY model_id ORDER BY model_id"
    ).fetchall()
    assert rows == [(0, 1), (5, 1)]

    s0 = Searcher.build(tmp_db, 0, 0, model.dim, engine="xla", use_snapshot=False)
    s5 = Searcher.build(tmp_db, 5, 0, model.dim, engine="xla", use_snapshot=False)
    assert len(s0.matrix) == 1 and len(s5.matrix) == 1


def test_embed_failure_poisons_batch_not_scan(tmp_db, tmp_path, model):
    """A dying encoder fails only its batch: items are still written (without
    embeddings) and re-embedded on the next scan (reference aborted the whole
    stage; see pipeline.py docstring)."""
    root = tmp_path / "docs8"
    root.mkdir()
    (root / "x.txt").write_text("hello world")
    (root / "y.txt").write_text("alpha beta")
    src = _add_fs_source(tmp_db, root)

    class FailingModel:
        model_id, model_version, dim = model.model_id, model.model_version, model.dim
        tokenizer = model.tokenizer

        def encode_dispatch(self, texts):
            raise RuntimeError("device on fire")

        materialize = staticmethod(model.materialize)

    stats, ok = scan_source(tmp_db, FailingModel(), src, embed_batch_size=4)
    assert ok  # pipeline completed
    assert stats.added.value == 2
    assert stats.encoded.value == 0
    assert tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0] == 0

    # healthy rescan: missing embeddings force re-embed (has_embedding false)
    stats2, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok and stats2.encoded.value == 2
    assert tmp_db.read().execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0] == 2


def test_scan_hostile_tree(tmp_db, tmp_path, model):
    """Fuzz-ish robustness: symlink loops, dangling links, unreadable files,
    NUL bytes, invalid UTF-8, very long lines, deeply nested dirs, weird
    names, fifos — the scan must complete, index the sane text, and skip the
    rest without crashing or hanging."""
    root = tmp_path / "hostile"
    root.mkdir()
    (root / "ok.txt").write_text("alpha beta gamma\n")
    # invalid utf-8 and NUL bytes -> omitted
    (root / "bad_utf8.txt").write_bytes(b"\x80\x81\xfe\xff alpha")
    (root / "nul.txt").write_bytes(b"alpha\x00beta")  # decodes; indexed or omitted, must not crash
    # very long single line (1 MB)
    (root / "long.txt").write_text("alpha " * 200_000)
    # deep nesting
    deep = root
    for i in range(40):
        deep = deep / f"d{i}"
    deep.mkdir(parents=True)
    (deep / "deep.txt").write_text("hello world\n")
    # weird names
    (root / "sp ace & (chars) ~!.txt").write_text("delta news\n")
    (root / "uni-héllo-🌍.txt").write_text("notes world\n")
    # symlink loop + dangling symlink (must not hang or crash)
    os.symlink(str(root), str(root / "loop"), target_is_directory=True)
    os.symlink(str(root / "missing.txt"), str(root / "dangling.txt"))
    # unreadable file -> omitted
    unread = root / "secret.txt"
    unread.write_text("alpha")
    os.chmod(unread, 0)
    # fifo (read would block forever if opened naively by a follower of
    # symlink/fifo; scanner stats it as a non-regular file or read fails)
    fifo_ok = True
    try:
        os.mkfifo(root / "pipe.fifo")
    except (OSError, AttributeError):
        fifo_ok = False

    src = add_source(tmp_db, Source(name="hostile", config={"type": "fs"}, location=str(root)))
    searcher = Searcher(0, 0, model.dim, engine="xla")
    stats, ok = scan_source(
        tmp_db, model, src, on_embeddings=searcher.upsert_embeddings, embed_batch_size=8
    )
    assert ok, "hostile tree must not fail the scan"

    indexed = {
        r[0].rsplit("/", 1)[-1]
        for r in tmp_db.read().execute(
            """SELECT external_id FROM items
               JOIN item_embeddings ie ON ie.item_id = items.id"""
        ).fetchall()
    }
    for name in ("ok.txt", "long.txt", "deep.txt", "sp ace & (chars) ~!.txt"):
        assert name in indexed, f"{name} should be indexed, got {indexed}"
    assert "bad_utf8.txt" not in indexed
    if os.geteuid() != 0:  # root reads mode-0 files; the omit path needs a non-root run
        assert "secret.txt" not in indexed
    if fifo_ok:
        assert "pipe.fifo" not in indexed
    # searching still works over the hostile corpus
    hits = searcher.search(model, "hello world", 3)
    assert hits
    os.chmod(unread, 0o644)  # let pytest clean the tmpdir


def test_changed_item_embed_failure_retries_next_scan(tmp_db, tmp_path, model):
    """Embed failure on a CHANGED document must leave its row at the OLD
    content/mtime so the next scan re-detects the change and re-embeds —
    writing the new row while keeping the stale vector would pin the
    pre-change embedding forever (review r2: pipeline.py write stage)."""
    root = tmp_path / "docs_cf"
    root.mkdir()
    (root / "x.txt").write_text("hello world")
    src = _add_fs_source(tmp_db, root)
    stats, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok and stats.added.value == 1

    time.sleep(1.1)  # whole-second mtimes
    (root / "x.txt").write_text("alpha beta gamma")

    class FailingModel:
        model_id, model_version, dim = model.model_id, model.model_version, model.dim
        tokenizer = model.tokenizer

        def encode_dispatch(self, texts):
            raise RuntimeError("device on fire")

        materialize = staticmethod(model.materialize)

    stats2, ok2 = scan_source(tmp_db, FailingModel(), src, embed_batch_size=4)
    assert ok2
    # the row still carries the OLD content (the failed change was not written)
    row = tmp_db.read().execute("SELECT content FROM items").fetchone()
    assert row[0] == "hello world"

    # healthy rescan re-detects the change and re-embeds the new content
    stats3, ok3 = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok3 and stats3.changed.value == 1 and stats3.encoded.value == 1
    row = tmp_db.read().execute("SELECT content FROM items").fetchone()
    assert row[0] == "alpha beta gamma"


def test_found_item_skip_discovered_at_read_persists(tmp_db, tmp_path, model):
    """A SkipReason discovered at read time for a FOUND item must persist and
    remove the item's stale vectors (review r2: the settle block classified
    it UNCHANGED, dropping the skip on the floor)."""
    from perceive_tpu.sources.pipeline import scan_source as _scan
    from perceive_tpu.sources.scanner import ReadResult, SourceScanner
    from perceive_tpu.types import SkipReason

    class FlakyScanner(SourceScanner):
        """Emits one item; read() skips it on demand (a 404-ing web page)."""

        def __init__(self, source_id, skip_now):
            self.source_id = source_id
            self.skip_now = skip_now

        def scan(self, emit):
            emit(Item(id=-1, source_id=self.source_id, external_id="https://x/p",
                      metadata=ItemMetadata(mtime=None, atime=1)))

        def read(self, existing, compare_strategy, item):
            if self.skip_now:
                item.skipped = SkipReason.NOT_FOUND
                item.content = ""
                return ReadResult.FOUND
            item.content = "hello world"
            return ReadResult.FOUND

        def latest_process_version(self):
            return 0

    src = add_source(tmp_db, Source(name="web", config={"type": "fs"}, location="x"))
    import perceive_tpu.sources.scanner as scanner_mod

    sc = FlakyScanner(src.id, skip_now=False)
    orig = scanner_mod.create_scanner
    scanner_mod.create_scanner = lambda s: sc
    import perceive_tpu.sources.pipeline as pipeline_mod

    pipeline_mod.create_scanner = lambda s: sc
    try:
        stats, ok = _scan(tmp_db, model, src)
        assert ok and stats.added.value == 1
        assert tmp_db.read().execute(
            "SELECT COUNT(*) FROM item_embeddings").fetchone()[0] == 1

        sc.skip_now = True  # the page starts 404ing
        stats2, ok2 = _scan(tmp_db, model, src)
        assert ok2
        row = tmp_db.read().execute("SELECT skipped FROM items").fetchone()
        assert row[0] == str(SkipReason.NOT_FOUND)
        assert tmp_db.read().execute(
            "SELECT COUNT(*) FROM item_embeddings").fetchone()[0] == 0
    finally:
        scanner_mod.create_scanner = orig
        pipeline_mod.create_scanner = orig


def test_non_utf8_filename_skipped_not_fatal(tmp_db, tmp_path, model):
    """A filename with invalid UTF-8 bytes must be skipped with a note, not
    crash the write stage (sqlite refuses surrogate strings; one bad name
    previously truncated every later batch of the scan)."""
    root = tmp_path / "docs_sur"
    root.mkdir()
    (root / "good.txt").write_text("hello world")
    bad = os.fsdecode(b"caf\xe9.txt")  # surrogate-escaped non-UTF-8 name
    with open(root / bad, "w") as f:
        f.write("alpha beta")

    src = _add_fs_source(tmp_db, root)
    stats, ok = scan_source(tmp_db, model, src, embed_batch_size=4)
    assert ok
    assert stats.added.value == 1  # the good file indexed, the bad one skipped
    rows = [r[0] for r in tmp_db.read().execute("SELECT external_id FROM items")]
    assert rows and all("good.txt" in r for r in rows)


def test_hidden_item_stays_out_of_matrix_on_rescan(tmp_db, tmp_path, model):
    """`hide` must survive a force-rescan and a reprocess: the DB rows keep
    updating (so unhide can restore) but the device matrix must not re-admit
    the hidden item's vectors (review r3: match/reprocess SQL has no
    hidden_at filter)."""
    from perceive_tpu.index.matrix import key_item
    from perceive_tpu.sources.reprocess import reprocess_source

    root = tmp_path / "docs_hide"
    root.mkdir()
    (root / "x.txt").write_text("hello world")
    (root / "y.txt").write_text("delta news")
    src = _add_fs_source(tmp_db, root)
    searcher = Searcher(0, 0, model.dim, engine="xla")
    scan_source(
        tmp_db, model, src, on_embeddings=searcher.upsert_embeddings,
        on_removed=searcher.remove_items, embed_batch_size=4,
    )
    hid = tmp_db.read().execute(
        "SELECT id FROM items WHERE external_id LIKE '%x.txt'"
    ).fetchone()[0]
    tmp_db.set_item_hidden(hid, True)
    searcher.remove_items([hid])
    assert hid not in {key_item(k) for k in searcher.matrix.row_of}

    # force-rescan re-embeds the item; its vectors must NOT come back
    scan_source(
        tmp_db, model, src, compare_strategy=ItemCompareStrategy.FORCE,
        on_embeddings=searcher.upsert_embeddings, on_removed=searcher.remove_items,
        embed_batch_size=4,
    )
    assert hid not in {key_item(k) for k in searcher.matrix.row_of}
    # ...and reprocess must not re-admit it either
    reprocess_source(
        tmp_db, model, src, on_embeddings=searcher.upsert_embeddings,
        on_removed=searcher.remove_items, embed_batch_size=4,
    )
    assert hid not in {key_item(k) for k in searcher.matrix.row_of}
    # the DB row stayed current, so unhide restores the vectors
    tmp_db.set_item_hidden(hid, False)
    chunks = searcher.stored_embeddings(tmp_db, hid)
    assert chunks
    keys = [(hid, ci) for ci, _ in chunks]
    searcher.upsert_embeddings(keys, [src.id] * len(keys), np.stack([v for _, v in chunks]))
    assert hid in {key_item(k) for k in searcher.matrix.row_of}


def test_maintenance_never_runs_inside_write_txn(tmp_db, tmp_path, model, monkeypatch):
    """Index maintenance (retier restage, coarse audit) must run AFTER each
    write batch's SQLite transaction commits, never while the write lock is
    held — a mid-ingest retier/audit can take seconds-to-minutes at int2
    scale and would starve every other writer (review r3).  The pipeline
    hooks defer it; _write_stage invokes after_commit outside the txn."""
    from perceive_tpu.index.searcher import Searcher as S

    root = _make_tree(tmp_path / "docs")
    src = _add_fs_source(tmp_db, root)
    searcher = Searcher(0, 0, model.dim, engine="xla")
    searcher.auto_retier = True

    in_txn_calls = []
    maintenance_calls = []
    orig_retier = S._maybe_retier
    orig_audit = S._audit_coarse_if_stale

    def spy(name, orig):
        def wrapper(self):
            maintenance_calls.append(name)
            if tmp_db._write_conn.in_transaction:
                in_txn_calls.append(name)
            return orig(self)

        return wrapper

    monkeypatch.setattr(S, "_maybe_retier", spy("retier", orig_retier))
    monkeypatch.setattr(S, "_audit_coarse_if_stale", spy("audit", orig_audit))

    on_emb, on_rm = searcher.pipeline_hooks()
    stats, ok = scan_source(
        tmp_db, model, src, on_embeddings=on_emb, on_removed=on_rm, embed_batch_size=2
    )
    assert ok and stats.encoded.value == 3
    assert len(searcher.matrix) == 3  # hook data path still ran in-txn
    assert maintenance_calls, "deferred maintenance never ran"
    assert not in_txn_calls, (
        f"maintenance ran inside the open write transaction: {in_txn_calls}"
    )


def test_stage_failure_after_sentinel_does_not_hang():
    """A stage that fails AFTER its main loop consumed the input sentinel
    (e.g. the embed stage's final flush) must not re-drain the queue — the
    sentinel is gone and nobody will put again, so the old error-path drain
    blocked forever and hung scan_source at join() (review r3)."""
    import queue as _q

    from perceive_tpu.sources import pipeline as pl

    q = _q.Queue()
    q.put(1)
    q.put(pl._SENTINEL)

    def fn():
        for _ in pl._drain_queue(q):
            pass
        raise RuntimeError("post-sentinel failure")

    errors: list = []
    t = pl._Stage("t", fn, q, errors)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "stage hung draining a finished queue"
    assert errors and errors[0][0] == "t"

    # pre-sentinel failures still drain (upstream must never block)
    q2 = _q.Queue()
    for v in (1, 2, 3, pl._SENTINEL):
        q2.put(v)

    def fn2():
        next(iter(pl._drain_queue(q2)))  # consume ONE item, then die
        raise RuntimeError("mid-stream failure")

    errors2: list = []
    t2 = pl._Stage("t2", fn2, q2, errors2)
    t2.start()
    t2.join(timeout=10)
    assert not t2.is_alive()
    assert q2.empty(), "error path did not drain the remaining items"


def test_read_time_excludes_backpressure_wait():
    """read_time must bill only read work, not out_q.put blocking on a slow
    downstream stage — a bench run attributed 6.06 s of a 7.14 s wall to
    "read" while the actual reads cost ~0.6 s (the readers were waiting on
    the device).  Attribution semantics now match encode_time/write_time."""
    import queue as _q
    import threading

    from perceive_tpu.sources import pipeline as pl
    from perceive_tpu.sources.scanner import ReadResult, ScanStats, SourceScanner

    class InstantScanner(SourceScanner):
        def scan(self, emit):  # pragma: no cover - unused
            pass

        def read(self, existing, compare_strategy, item):
            item.content = "x"
            return ReadResult.FOUND

        def latest_process_version(self):
            return 0

    n = 12
    in_q: _q.Queue = _q.Queue()
    out_q: _q.Queue = _q.Queue(maxsize=1)  # forces put() to block
    for i in range(n):
        in_q.put(pl.ScanItem(
            state=ScanItemState.NEW,
            item=Item(id=-1, source_id=1, external_id=f"doc{i}",
                      metadata=ItemMetadata()),
        ))
    in_q.put(pl._SENTINEL)

    stats = ScanStats()
    consumed: list = []

    def slow_consumer():
        while len(consumed) < n:
            consumed.append(out_q.get())
            time.sleep(0.05)  # ~0.6 s of downstream stall in total

    c = threading.Thread(target=slow_consumer, daemon=True)
    c.start()
    t0 = time.perf_counter()
    pl._read_stage(stats, ItemCompareStrategy.MTIME_AND_CONTENT,
                   InstantScanner(), in_q, out_q)
    wall = time.perf_counter() - t0
    c.join(timeout=10)
    assert len(consumed) == n
    # the stage wall is dominated by the consumer's sleeps; read_time must
    # not absorb them (generous bound: a quarter of the stalled wall)
    assert wall > 0.4, f"consumer stall did not materialize (wall={wall:.3f}s)"
    assert stats.read_time.elapsed() < wall / 4, (
        f"read_time {stats.read_time.elapsed():.3f}s absorbed backpressure "
        f"wait (stage wall {wall:.3f}s)"
    )
