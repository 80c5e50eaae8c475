"""Web connectors over canned fixtures: fake HTTP session, canned History
SQLite, canned Bookmarks JSON (SURVEY.md §4: recorded HTTP / fake connectors)."""

import json
import sqlite3

import numpy as np
import pytest

from perceive_tpu.db import add_source
from perceive_tpu.sources import scan_source
from perceive_tpu.sources.chromium_bookmarks import ChromiumBookmarksScanner
from perceive_tpu.sources.chromium_history import (
    ChromiumHistoryScanner,
    normalize_url,
    webkit_to_unix,
)
from perceive_tpu.sources.fs import decompress_raw
from perceive_tpu.sources.parse_html import (
    extract_html_article,
    fetch_html,
    reprocess_html_article,
    should_skip,
)
from perceive_tpu.sources.scanner import FoundItem, ReadResult
from perceive_tpu.types import Item, ItemCompareStrategy, ItemMetadata, SkipReason, Source

PAGE = """<html><head><title>JAX on TPU</title></head><body>
<nav><a href="/">Home</a><a href="/about">About</a></nav>
<article><h1>JAX on TPU</h1>
<p>JAX compiles numerical programs for tensor processing units using XLA.</p>
<p>Pallas exposes the memory hierarchy so kernels can stream from HBM through VMEM.</p>
</article>
<footer>Copyright Footer Inc</footer></body></html>"""


class FakeResponse:
    def __init__(self, status=200, headers=None, text=""):
        self.status_code = status
        self.headers = headers or {}
        self.text = text


class FakeSession:
    def __init__(self, responses):
        self.responses = responses  # url -> FakeResponse | Exception
        self.requests = []  # (url, headers)

    def get(self, url, headers=None, timeout=None, allow_redirects=False):
        self.requests.append((url, headers or {}))
        r = self.responses[url]
        if isinstance(r, Exception):
            raise r
        return r


def test_extract_article():
    title, text = extract_html_article("https://x.test/a", PAGE.encode())
    assert title == "JAX on TPU"
    assert "compiles numerical programs" in text
    assert "Copyright Footer" not in text
    assert "Home" not in text


def test_should_skip():
    assert should_skip([], "https://accounts.google.com/login")
    assert should_skip(["example.com"], "https://sub.example.com/x")
    assert not should_skip(["example.com"], "https://example.org/x")


def test_fetch_html_ok_and_conditional():
    url = "https://x.test/a"
    sess = FakeSession(
        {url: FakeResponse(200, {"Content-Type": "text/html; charset=utf-8", "ETag": '"v1"'}, PAGE)}
    )
    item = Item(external_id=url, metadata=ItemMetadata(mtime=1700000000))
    assert fetch_html(sess, None, item) is ReadResult.FOUND
    assert item.metadata.name == "JAX on TPU"
    assert "Pallas exposes" in item.content
    assert item.hash == '"v1"'
    assert decompress_raw(item.raw_content).decode().startswith("<html>")
    # conditional headers were sent
    _, headers = sess.requests[0]
    assert "If-Modified-Since" in headers

    # 304 path with stored etag
    sess2 = FakeSession({url: FakeResponse(304)})
    item2 = Item(external_id=url)
    assert (
        fetch_html(sess2, FoundItem(hash='"v1"'), item2) is ReadResult.UNCHANGED
    )
    assert sess2.requests[0][1].get("If-None-Match") == '"v1"'


@pytest.mark.parametrize(
    "status,reason",
    [(404, SkipReason.NOT_FOUND), (403, SkipReason.UNAUTHORIZED), (401, SkipReason.UNAUTHORIZED),
     (301, SkipReason.REDIRECTED), (410, SkipReason.FETCH_ERROR)],
)
def test_fetch_html_status_skips(status, reason):
    url = "https://x.test/s"
    sess = FakeSession({url: FakeResponse(status)})
    item = Item(external_id=url)
    assert fetch_html(sess, None, item) is ReadResult.FOUND
    assert item.skipped is reason


@pytest.mark.parametrize("status", [429, 500, 503])
def test_fetch_html_transient_statuses_raise(status):
    """429/5xx are TRANSIENT: they must raise (the read stage keeps the
    item's stored content and retry window) instead of persisting a
    permanent FETCH_ERROR that wipes an indexed page's content and vectors
    over one rate-limit blip (review r3)."""
    from perceive_tpu.sources.parse_html import TransientFetchError

    url = "https://x.test/s"
    sess = FakeSession({url: FakeResponse(status)})
    item = Item(external_id=url)
    with pytest.raises(TransientFetchError):
        fetch_html(sess, None, item)
    assert item.skipped is None


def test_fetch_html_non_text_and_empty():
    url = "https://x.test/f.pdf"
    sess = FakeSession({url: FakeResponse(200, {"Content-Type": "application/pdf"}, "x")})
    item = Item(external_id=url)
    assert fetch_html(sess, None, item) is ReadResult.FOUND
    assert item.content == "" and item.skipped is None

    url2 = "https://x.test/empty"
    sess = FakeSession({url2: FakeResponse(200, {"Content-Type": "text/html"}, "")})
    item2 = Item(external_id=url2)
    fetch_html(sess, None, item2)
    assert item2.skipped is SkipReason.NO_CONTENT

    url3 = "https://x.test/err"
    sess = FakeSession({url3: ConnectionError("boom")})
    item3 = Item(external_id=url3)
    from perceive_tpu.sources.parse_html import TransientFetchError

    with pytest.raises(TransientFetchError):  # transient, retried next scan
        fetch_html(sess, None, item3)
    assert item3.skipped is None


def test_reprocess_html_article():
    url = "https://x.test/a"
    sess = FakeSession({url: FakeResponse(200, {"Content-Type": "text/html"}, PAGE)})
    item = Item(external_id=url)
    fetch_html(sess, None, item)
    # unchanged content -> UNCHANGED
    assert reprocess_html_article(item) is ReadResult.UNCHANGED
    # wipe extraction -> re-extracts from raw
    item.content = "stale"
    assert reprocess_html_article(item) is ReadResult.FOUND
    assert "Pallas exposes" in item.content


# -- chromium history --------------------------------------------------------


def _make_history_db(path, rows):
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE urls (id INTEGER PRIMARY KEY, url TEXT, title TEXT, last_visit_time INTEGER)")
    conn.executemany("INSERT INTO urls (url, title, last_visit_time) VALUES (?,?,?)", rows)
    conn.commit()
    conn.close()


WEBKIT_2023 = (1_700_000_000 + 11_644_473_600) * 1_000_000


def test_history_scan(tmp_path):
    _make_history_db(
        tmp_path / "History",
        [
            ("http://example.com/page#frag", "Example", WEBKIT_2023),
            ("https://example.com/page", "Example", WEBKIT_2023 + 5_000_000),
            ("https://example.com/page/", "Example slash", WEBKIT_2023),  # dedupe
            ("https://accounts.google.com/x", "Skip me", WEBKIT_2023),
            ("chrome-extension://junk", "Nope", WEBKIT_2023),
            ("https://other.org/a", "Other", WEBKIT_2023),
        ],
    )
    scanner = ChromiumHistoryScanner(1, str(tmp_path), {"skip": []})
    items = []
    scanner.scan(items.append)
    urls = sorted(i.external_id for i in items)
    assert urls == ["https://example.com/page", "https://other.org/a"]
    ex = next(i for i in items if "example" in i.external_id)
    assert ex.metadata.atime in (1_700_000_000, 1_700_000_005)
    assert ex.metadata.name == "Example"


def test_history_read_gates():
    scanner = ChromiumHistoryScanner(1, "/nonexistent", {"skip": []})
    # permanent skip honored
    item = Item(external_id="https://x.test/a", metadata=ItemMetadata(atime=100))
    existing = FoundItem(skipped=SkipReason.NOT_FOUND, last_accessed=50)
    assert scanner.read(existing, ItemCompareStrategy.MTIME_AND_CONTENT, item) is ReadResult.UNCHANGED
    assert item.skipped is SkipReason.NOT_FOUND
    # not newer access (and a vector already present) -> unchanged, no fetch
    item2 = Item(external_id="https://x.test/a", metadata=ItemMetadata(atime=40))
    assert scanner.read(
        FoundItem(last_accessed=50, has_embedding=True),
        ItemCompareStrategy.MTIME_AND_CONTENT, item2,
    ) is ReadResult.UNCHANGED
    # NO embedding for the active model (model switch): the freshness gate
    # must not veto the re-embed — the STORED content is reused without any
    # HTTP fetch and FOUND preserves the match stage's CHANGED state
    # (review r2: chromium_history.py atime gate)
    item3 = Item(external_id="https://x.test/a", metadata=ItemMetadata(atime=40))
    got = scanner.read(
        FoundItem(last_accessed=50, has_embedding=False, content="stored text"),
        ItemCompareStrategy.MTIME_AND_CONTENT, item3,
    )
    assert got is ReadResult.FOUND
    assert item3.content == "stored text" and item3.skipped is None
    # ...but an item that never produced content (untitled PDF) follows the
    # normal freshness gate instead of re-fetching forever
    item4 = Item(external_id="https://x.test/a", metadata=ItemMetadata(atime=40))
    assert scanner.read(
        FoundItem(last_accessed=50, has_embedding=False, content=""),
        ItemCompareStrategy.MTIME_AND_CONTENT, item4,
    ) is ReadResult.UNCHANGED


def test_normalize_url():
    assert normalize_url("http://a.com/x#frag") == ("https://a.com/x", "https://a.com/x")
    f, d = normalize_url("https://a.com/x/")
    assert f == "https://a.com/x/" and d == "https://a.com/x"
    assert normalize_url("notaurl") is None
    assert webkit_to_unix(WEBKIT_2023) == 1_700_000_000


# -- chromium bookmarks ------------------------------------------------------


def test_bookmarks_scan(tmp_path):
    bookmarks = {
        "roots": {
            "bookmark_bar": {
                "type": "folder",
                "id": "1",
                "name": "Bar",
                "children": [
                    {"type": "url", "id": "2", "url": "https://keep.org/a", "name": "Keep",
                     "date_added": str(WEBKIT_2023), "date_last_used": "0"},
                    {"type": "folder", "id": "3", "name": "Sub", "children": [
                        {"type": "url", "id": "4", "url": "https://nested.org/b", "name": "Nested",
                         "date_added": "0", "date_last_used": str(WEBKIT_2023 + 9_000_000)},
                    ]},
                    {"type": "url", "id": "5", "url": "https://googleapis.com/x", "name": "Skip",
                     "date_added": "0", "date_last_used": "0"},
                    {"type": "url", "id": "6", "url": "bogus", "name": "Bad",
                     "date_added": "0", "date_last_used": "0"},
                ],
            }
        }
    }
    (tmp_path / "Bookmarks").write_text(json.dumps(bookmarks))
    scanner = ChromiumBookmarksScanner(1, str(tmp_path), {"skip": []})
    items = []
    scanner.scan(items.append)
    urls = sorted(i.external_id for i in items)
    assert urls == ["https://keep.org/a", "https://nested.org/b"]
    keep = next(i for i in items if "keep" in i.external_id)
    assert keep.metadata.atime == 1_700_000_000  # date_added fallback, WebKit-converted
    nested = next(i for i in items if "nested" in i.external_id)
    assert nested.metadata.atime == 1_700_000_009


# -- end-to-end web scan through the pipeline --------------------------------


def test_history_pipeline_end_to_end(tmp_db, tmp_path):
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab

    vocab = tiny_test_vocab("jax tpu pallas kernels memory example other".split())
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=32)
    model = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=1)
    model.model_id = 0

    _make_history_db(
        tmp_path / "History",
        [("https://x.test/a", "A", WEBKIT_2023), ("https://x.test/missing", "B", WEBKIT_2023)],
    )
    src = add_source(
        tmp_db,
        Source(name="hist", config={"type": "chromium_history", "skip": []}, location=str(tmp_path)),
    )
    scanner = ChromiumHistoryScanner(src.id, str(tmp_path), {"skip": []})
    scanner.session = FakeSession(
        {
            "https://x.test/a": FakeResponse(200, {"Content-Type": "text/html", "ETag": '"e1"'}, PAGE),
            "https://x.test/missing": FakeResponse(404),
        }
    )
    searcher = Searcher(0, 0, model.dim, engine="xla")
    stats, ok = scan_source(
        tmp_db, model, src, scanner=scanner, on_embeddings=searcher.upsert_embeddings,
        embed_batch_size=4,
    )
    assert ok
    rows = {r[0]: r for r in tmp_db.read().execute(
        "SELECT external_id, name, skipped, content FROM items")}
    assert rows["https://x.test/a"][1] == "JAX on TPU"
    assert rows["https://x.test/missing"][2] == "not_found"
    # only the fetched page embedded (possibly as several chunk rows now
    # that chunk-embedding is default-on for long documents)
    from perceive_tpu.index.matrix import key_item

    assert len(searcher.matrix) >= 1
    assert {key_item(k) for k in searcher.matrix.row_of} == {
        tmp_db.read().execute(
            "SELECT id FROM items WHERE external_id = 'https://x.test/a'"
        ).fetchone()[0]
    }

    # second scan: 404 is permanent -> no refetch; page not newer -> unchanged
    scanner.session.requests.clear()
    stats2, ok = scan_source(tmp_db, model, src, scanner=scanner, embed_batch_size=4)
    assert ok
    assert scanner.session.requests == []
    assert stats2.encoded.value == 0


def test_extract_strips_all_chrome_and_no_duplicates():
    """drop_tree mid-iteration used to leave later <script>s in the tree, and
    container block tags duplicated every child paragraph."""
    page = b"""<html><body>
    <nav><a href='/'>Home</a></nav>
    <section><article>
      <p>First paragraph of the article body text here.</p>
      <p>Second paragraph with more body text content.</p>
      <script>var tracked = 'SECRET_JS_TOKEN';</script>
    </article></section>
    <style>.x { color: red }</style>
    </body></html>"""
    _, text = extract_html_article("https://x.test/p", page)
    assert "SECRET_JS_TOKEN" not in text
    assert "color: red" not in text
    assert text.count("First paragraph") == 1
    assert text.count("Second paragraph") == 1


def test_conditional_get_uses_stored_last_modified():
    """Re-scan items carry no mtime; If-Modified-Since must come from the
    stored Last-Modified (FoundItem.modified)."""
    url = "https://x.test/lm"
    sess = FakeSession({url: FakeResponse(304)})
    item = Item(external_id=url)  # fresh scan item, no mtime
    existing = FoundItem(modified=1_700_000_000)
    assert fetch_html(sess, existing, item) is ReadResult.UNCHANGED
    headers = sess.requests[0][1]
    assert "If-Modified-Since" in headers
    assert "2023" in headers["If-Modified-Since"]


def test_bookmarks_dedupe_and_normalize(tmp_path):
    """The same page bookmarked in two folders yields ONE item, normalized
    like the history connector (https, no fragment)."""
    bookmarks = {
        "roots": {
            "bar": {"type": "folder", "id": "1", "name": "Bar", "children": [
                {"type": "url", "id": "2", "url": "http://dup.org/page#frag", "name": "A",
                 "date_added": str(WEBKIT_2023), "date_last_used": "0"},
                {"type": "url", "id": "3", "url": "https://dup.org/page/", "name": "B",
                 "date_added": str(WEBKIT_2023), "date_last_used": "0"},
            ]},
            "other": {"type": "folder", "id": "4", "name": "Other", "children": [
                {"type": "url", "id": "5", "url": "https://dup.org/page", "name": "C",
                 "date_added": str(WEBKIT_2023), "date_last_used": "0"},
            ]},
        }
    }
    (tmp_path / "Bookmarks").write_text(json.dumps(bookmarks))
    scanner = ChromiumBookmarksScanner(1, str(tmp_path), {"skip": []})
    items = []
    scanner.scan(items.append)
    assert len(items) == 1
    assert items[0].external_id == "https://dup.org/page"


def test_should_skip_requires_domain_boundary():
    """Skip suffixes match whole domain labels: 'x.com' must not swallow
    'phonetix.com' (review r2; deliberate fix over the reference's raw
    ends_with, parse_html.rs:22-28)."""
    from perceive_tpu.sources.parse_html import should_skip

    assert should_skip(["x.com"], "https://x.com/a")
    assert should_skip(["x.com"], "https://sub.x.com/a")
    assert not should_skip(["x.com"], "https://phonetix.com/a")
    assert should_skip([], "https://maps.googleapis.com/z")  # ALWAYS_SKIP
    assert not should_skip([], "https://notgoogleapis.com/z")


def test_force_fetch_suppresses_conditional_headers():
    """FORCE (or a missing embedding) must fetch the full body: sending the
    stored ETag/Last-Modified would let a 304 downgrade the forced item to
    UNCHANGED and no re-embed would ever happen (review r2)."""
    from perceive_tpu.sources.parse_html import fetch_html

    url = "https://x.test/forced"
    sess = FakeSession({url: FakeResponse(200, {"Content-Type": "text/html"}, PAGE)})
    existing = FoundItem(hash="etag-123", modified=1000, has_embedding=True)

    item = Item(external_id=url, metadata=ItemMetadata())
    assert fetch_html(sess, existing, item, unconditional=True) is ReadResult.FOUND
    _, headers = sess.requests[-1]
    assert "If-None-Match" not in headers and "If-Modified-Since" not in headers

    # the normal path still sends them
    item2 = Item(external_id=url, metadata=ItemMetadata())
    fetch_html(sess, existing, item2)
    _, headers2 = sess.requests[-1]
    assert headers2.get("If-None-Match") == "etag-123"
    assert "If-Modified-Since" in headers2


def test_extract_bare_container_text():
    """Bare text directly inside the winning container (div text, br-separated
    lines, inline tags outside any <p>) is article body, not droppable
    (review r2: readability emit() recursed past it)."""
    html = (
        "<html><body><div id='content'>Full article text about tensors"
        "<br>and more body text here<b> with bold inline</b> tail words"
        "<p>Share this post.</p></div></body></html>"
    )
    _, text = extract_html_article("https://x.test/b", html.encode())
    assert "Full article text about tensors" in text
    assert "and more body text here" in text
    assert "with bold inline" in text
    assert "Share this post." in text


def test_model_switch_reembeds_web_source_without_refetch(tmp_db, tmp_path):
    """Under an mtime-only compare strategy the match stage doesn't load
    content for comparison — but rows MISSING the active model's vector must
    still get their stored content through to the read gate, or a model
    switch leaves the source permanently unindexed (the freshness gate would
    veto the re-fetch and the CHANGED item would downgrade to UNCHANGED)."""
    from perceive_tpu.index.searcher import Searcher
    from perceive_tpu.models import EncoderArch, HeadConfig, Model, TextTokenizer, tiny_test_vocab

    vocab = tiny_test_vocab("jax tpu pallas kernels memory example other".split())
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=32)

    _make_history_db(tmp_path / "History", [("https://x.test/a", "A", WEBKIT_2023)])
    src = add_source(
        tmp_db,
        Source(
            name="hist",
            config={"type": "chromium_history", "skip": []},
            location=str(tmp_path),
            compare_strategy=ItemCompareStrategy.MTIME,
        ),
    )
    scanner = ChromiumHistoryScanner(src.id, str(tmp_path), {"skip": []})
    scanner.session = FakeSession(
        {"https://x.test/a": FakeResponse(200, {"Content-Type": "text/html"}, PAGE)}
    )

    model_a = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=1)
    model_a.model_id = 0
    searcher_a = Searcher(0, 0, model_a.dim, engine="xla")
    stats, ok = scan_source(
        tmp_db, model_a, src, scanner=scanner, on_embeddings=searcher_a.upsert_embeddings,
        embed_batch_size=4,
    )
    assert ok and len(searcher_a.matrix) >= 1

    # switch the active model (new model_id) and rescan: the same visit is
    # NOT newer, so any re-fetch attempt would be vetoed — the re-embed must
    # run from STORED content with zero HTTP traffic
    scanner.session.requests.clear()
    model_b = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=2)
    model_b.model_id = 1
    searcher_b = Searcher(1, 0, model_b.dim, engine="xla")
    stats2, ok = scan_source(
        tmp_db, model_b, src, scanner=scanner, on_embeddings=searcher_b.upsert_embeddings,
        embed_batch_size=4,
    )
    assert ok
    assert scanner.session.requests == []
    assert stats2.encoded.value >= 1
    assert len(searcher_b.matrix) >= 1
    assert tmp_db.read().execute(
        "SELECT COUNT(*) FROM item_embeddings WHERE model_id = 1"
    ).fetchone()[0] >= 1


def test_bookmarks_dedupe_merges_freshest_atime_and_title(tmp_path):
    """Folder-duplicate bookmarks merge the NEWEST atime (and a non-empty
    title) instead of keeping the first folder's entry wholesale — a stale
    atime would make the freshness gate skip re-fetching a page the user
    still uses (review r3; mirrors the history connector's MAX() merge)."""
    newer = WEBKIT_2023 + 100_000_000  # +100 s
    bookmarks = {
        "roots": {
            "bar": {"type": "folder", "id": "1", "name": "Bar", "children": [
                {"type": "url", "id": "2", "url": "https://dup.org/page", "name": "",
                 "date_added": str(WEBKIT_2023), "date_last_used": "0"},
            ]},
            "other": {"type": "folder", "id": "4", "name": "Other", "children": [
                {"type": "url", "id": "5", "url": "https://dup.org/page/", "name": "Title",
                 "date_added": str(WEBKIT_2023), "date_last_used": str(newer)},
            ]},
        }
    }
    (tmp_path / "Bookmarks").write_text(json.dumps(bookmarks))
    scanner = ChromiumBookmarksScanner(1, str(tmp_path), {"skip": []})
    items = []
    scanner.scan(items.append)
    assert len(items) == 1
    assert items[0].metadata.atime == 1_700_000_100
    assert items[0].metadata.name == "Title"
