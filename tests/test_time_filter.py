"""Time-window search filters (--after/--before/--sort, serve after=/before=).

Beyond-parity feature: the reference has no time filtering at all (its
search surface is cmd/search.rs:39-124 — source/type/-n only).  Items carry
mtime/atime (types.py), so a personal-search user can scope "that note I
edited last week" without leaving semantic ranking.
"""

import json
import os
import time
import urllib.request

import pytest

from perceive_tpu.cli import AppState, build_parser, dispatch
from perceive_tpu.cli.commands import (
    filter_results_by_time,
    item_time,
    parse_when,
)
from perceive_tpu.models import (
    EncoderArch,
    HeadConfig,
    Model,
    TextTokenizer,
    tiny_test_vocab,
)


@pytest.fixture(scope="module")
def model():
    words = "jax tpu pallas kernels alpha beta gamma notes hello world".split()
    vocab = tiny_test_vocab(words)
    tok = TextTokenizer.from_vocab(vocab, max_seq_length=32)
    arch = EncoderArch(vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=4,
                       intermediate_size=64, max_position_embeddings=32)
    m = Model.random(arch, HeadConfig(pooling="mean", normalize=True), tok, seed=4)
    m.model_id = 0
    return m


@pytest.fixture()
def state(tmp_path, model):
    st = AppState(str(tmp_path / "db.sqlite3"), model=model, engine="xla")
    yield st
    st.close()


def run(state, argv):
    parser = build_parser()
    args = parser.parse_args(argv)
    return dispatch(state, args)


# -- parse_when --------------------------------------------------------------


def test_parse_when_relative():
    now = 1_700_000_000
    assert parse_when("7d", now=now) == now - 7 * 86400
    assert parse_when("12h", now=now) == now - 12 * 3600
    assert parse_when("30min", now=now) == now - 30 * 60
    assert parse_when("2w", now=now) == now - 2 * 604800
    assert parse_when("3mo", now=now) == now - 3 * 2629800
    assert parse_when("1y", now=now) == now - 31557600
    assert parse_when(" 45s ", now=now) == now - 45


def test_parse_when_absolute_and_epoch():
    from datetime import datetime

    # naive ISO dates are local time, matching what users type
    assert parse_when("2026-01-15") == int(datetime(2026, 1, 15).timestamp())
    assert parse_when("2026-01-15T09:30") == int(
        datetime(2026, 1, 15, 9, 30).timestamp()
    )
    assert parse_when("1700000000") == 1_700_000_000


def test_parse_when_rejects_garbage():
    for bad in ("yesterday", "7 parsecs", "", "12", "h7", "2026-15-99"):
        with pytest.raises(ValueError, match="can't parse time"):
            parse_when(bad)


def test_parse_when_defaults_to_wall_clock():
    lo = time.time()
    got = parse_when("1h")
    hi = time.time()
    assert lo - 3600 - 1 <= got <= hi - 3600 + 1


# -- filter_results_by_time ---------------------------------------------------


class _FakeItem:
    def __init__(self, mtime=None, atime=None):
        class _M:
            pass

        self.metadata = _M()
        self.metadata.mtime = mtime
        self.metadata.atime = atime


class _FakeResult:
    def __init__(self, item):
        self.item = item


def test_item_time_prefers_mtime_falls_back_to_atime():
    assert item_time(_FakeItem(mtime=5, atime=9)) == 5
    assert item_time(_FakeItem(mtime=None, atime=9)) == 9
    assert item_time(_FakeItem()) is None


def test_filter_results_by_time_window_semantics():
    rs = [
        _FakeResult(_FakeItem(mtime=100)),
        _FakeResult(_FakeItem(mtime=200)),
        _FakeResult(_FakeItem(atime=300)),
        _FakeResult(_FakeItem()),  # untimed: dropped by any window
    ]
    assert filter_results_by_time(rs, None, None) == rs  # no-op passthrough
    kept = filter_results_by_time(rs, 200, None)
    assert [item_time(r.item) for r in kept] == [200, 300]  # after inclusive
    kept = filter_results_by_time(rs, None, 300)
    assert [item_time(r.item) for r in kept] == [100, 200]  # before exclusive
    kept = filter_results_by_time(rs, 150, 300)
    assert [item_time(r.item) for r in kept] == [200]


# -- CLI integration ----------------------------------------------------------


OLD = 1_600_000_000  # 2020-09
NEW = 1_750_000_000  # 2025-06


def _corpus(state, tmp_path, capsys):
    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "old.md").write_text("jax tpu pallas kernels old notes\n")
    (docs / "new.md").write_text("jax tpu pallas kernels new notes\n")
    os.utime(docs / "old.md", (OLD, OLD))
    os.utime(docs / "new.md", (NEW, NEW))
    run(state, ["source", "add", "fs", str(docs), "--name", "docs"])
    run(state, ["source", "scan", "docs"])
    capsys.readouterr()


def _search_json(state, capsys, *extra):
    run(state, ["search", "jax", "tpu", "--json", *extra])
    return json.loads(capsys.readouterr().out)


def _names(rs):
    # CLI --json carries title=metadata.name (None without front matter)
    # plus url=external_id; serve's title already falls back to the url
    return [os.path.basename(r["title"] or r["url"]) for r in rs]


def test_cli_after_before_filters(state, tmp_path, capsys):
    _corpus(state, tmp_path, capsys)

    both = _search_json(state, capsys)
    assert set(_names(both)) == {"old.md", "new.md"}
    assert {r["time"] for r in both} == {OLD, NEW}  # --json carries the time

    after = _search_json(state, capsys, "--after", str(NEW - 5))
    assert _names(after) == ["new.md"]

    before = _search_json(state, capsys, "--before", str(OLD + 5))
    assert _names(before) == ["old.md"]

    window = _search_json(
        state, capsys, "--after", str(OLD - 5), "--before", str(OLD + 5)
    )
    assert _names(window) == ["old.md"]

    none = _search_json(
        state, capsys, "--after", str(NEW + 10_000_000)
    )
    assert none == []


def test_cli_sort_time_orders_by_recency(state, tmp_path, capsys):
    _corpus(state, tmp_path, capsys)
    rs = _search_json(state, capsys, "--sort", "time")
    assert _names(rs) == ["new.md", "old.md"]


def test_cli_bad_when_exits_with_message(state, tmp_path, capsys):
    _corpus(state, tmp_path, capsys)
    with pytest.raises(SystemExit, match="can't parse time"):
        run(state, ["search", "jax", "--after", "next tuesday"])


# -- serve integration ---------------------------------------------------------


def test_serve_time_filters(state, tmp_path, capsys):
    from perceive_tpu.serve import start_server

    _corpus(state, tmp_path, capsys)
    server = start_server(lambda: state, port=0)
    try:
        host, port = server.server_address[:2]
        base = f"http://{host}:{port}"
        server.perceive_state.ready.wait(60)

        def get(url):
            with urllib.request.urlopen(url, timeout=30) as r:
                return json.loads(r.read())

        rs = get(f"{base}/search?q=jax+tpu&k=5")
        assert set(_names(rs)) == {"old.md", "new.md"}
        assert {r["time"] for r in rs} == {OLD, NEW}

        rs = get(f"{base}/search?q=jax+tpu&k=5&after={NEW - 5}")
        assert _names(rs) == ["new.md"]

        rs = get(f"{base}/search?q=jax+tpu&k=5&before={OLD + 5}")
        assert _names(rs) == ["old.md"]

        # POST carries the same keys
        req = urllib.request.Request(
            f"{base}/search",
            data=json.dumps({"q": "jax tpu", "k": 5, "after": NEW - 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            rs = json.loads(r.read())
        assert _names(rs) == ["new.md"]

        # bad grammar is a 400, not a 500
        with pytest.raises(urllib.error.HTTPError) as ei:
            get(f"{base}/search?q=jax&after=sometime")
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
