"""Native C++ parallel walker vs. the Python reference walk."""

import os

import pytest

from perceive_tpu.native import fastwalk, fastwalk_available
from perceive_tpu.sources.fs import FileScanner
from perceive_tpu.types import Item


def _make_tree(root):
    root.mkdir(parents=True)
    (root / "a.txt").write_text("a")
    (root / ".hidden").write_text("x")
    (root / ".gitignore").write_text("ignored/\n*.log\n!keep.log\nbuild/out.txt\n")
    (root / "x.log").write_text("log")
    (root / "keep.log").write_text("keep")
    sub = root / "sub"
    sub.mkdir()
    (sub / "b.md").write_text("b")
    (sub / "nested.log").write_text("nested log")  # outer *.log applies at depth
    ig = root / "ignored"
    ig.mkdir()
    (ig / "c.txt").write_text("c")
    build = root / "build"
    build.mkdir()
    (build / "out.txt").write_text("out")  # anchored path pattern
    (build / "in.txt").write_text("in")
    inner = sub / "inner"
    inner.mkdir()
    (inner / ".gitignore").write_text("*.md\n")
    (inner / "d.md").write_text("d")  # ignored by inner rules
    (inner / "d.txt").write_text("d")


@pytest.mark.skipif(not fastwalk_available(), reason="no C++ toolchain")
def test_fastwalk_matches_python_walk(tmp_path):
    root = tmp_path / "tree"
    _make_tree(root)

    native = {p for p, _, _ in fastwalk(str(root))}

    scanner = FileScanner(1, str(root), {})
    got: list[Item] = []
    scanner._scan_python(str(root), got.append)
    python = {i.external_id for i in got}

    assert native == python
    rel = {os.path.relpath(p, root) for p in native}
    assert rel == {"a.txt", "keep.log", "sub/b.md", "build/in.txt", "sub/inner/d.txt"}


@pytest.mark.skipif(not fastwalk_available(), reason="no C++ toolchain")
def test_fastwalk_stat_fields(tmp_path):
    root = tmp_path / "t2"
    root.mkdir()
    f = root / "x.txt"
    f.write_text("hello")
    os.utime(f, (1_700_000_001, 1_700_000_002))
    [(path, mtime, atime)] = fastwalk(str(root))
    assert path.endswith("x.txt")
    assert atime == 1_700_000_001 and mtime == 1_700_000_002


@pytest.mark.skipif(not fastwalk_available(), reason="no C++ toolchain")
def test_scanner_uses_native(tmp_path):
    root = tmp_path / "t3"
    _make_tree(root)
    scanner = FileScanner(1, str(root), {"globs": ["*.txt"]})
    items = []
    scanner.scan(items.append)
    rel = {os.path.relpath(i.external_id, root) for i in items}
    assert rel == {"a.txt", "build/in.txt", "sub/inner/d.txt"}
    assert all(i.metadata.mtime and i.metadata.atime for i in items)
