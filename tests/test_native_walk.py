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


def _make_repo_tree(root, global_file):
    """Repo exercising every ignore-file source the reference honors
    (fs.rs:42-45 `ignore` crate defaults): .gitignore, .ignore,
    .git/info/exclude, the global gitignore."""
    root.mkdir(parents=True)
    (root / ".git" / "info").mkdir(parents=True)
    (root / ".git" / "info" / "exclude").write_text("excluded.txt\n")
    (root / ".gitignore").write_text("*.tmp\n")
    # .ignore outranks .gitignore in the same directory
    (root / ".ignore").write_text("private/\n!special.tmp\n")
    global_file.write_text("*.xyz\n")
    (root / "kept.txt").write_text("k")
    (root / "excluded.txt").write_text("x")      # .git/info/exclude
    (root / "note.tmp").write_text("t")          # .gitignore
    (root / "special.tmp").write_text("s")       # negated by .ignore
    (root / "global_hit.xyz").write_text("g")    # global gitignore
    priv = root / "private"
    priv.mkdir()
    (priv / "p.txt").write_text("p")             # .ignore dir rule
    docs = root / "docs"
    docs.mkdir()
    (docs / "readme.md").write_text("r")
    (docs / "inner.tmp").write_text("i")         # outer .gitignore at depth
    (docs / "inner.xyz").write_text("i")         # global applies at depth


def _both_walks(root):
    native = {p for p, _, _ in fastwalk(str(root))} if fastwalk_available() else None
    scanner = FileScanner(1, str(root), {})
    got: list[Item] = []
    scanner._scan_python(str(root), got.append)
    return native, {i.external_id for i in got}


def test_ignore_exclude_and_global_files(tmp_path, monkeypatch):
    """VERDICT r1 #8: .ignore, .git/info/exclude and the global gitignore
    must all be honored, identically in both walker implementations."""
    gf = tmp_path / "global_ignore"
    monkeypatch.setenv("PERCEIVE_TPU_GLOBAL_GITIGNORE", str(gf))
    root = tmp_path / "repo"
    _make_repo_tree(root, gf)

    native, python = _both_walks(root)
    rel = {os.path.relpath(p, root) for p in python}
    assert rel == {"kept.txt", "special.tmp", "docs/readme.md"}
    if native is not None:
        assert native == python


def test_walk_root_inside_repo_inherits_parent_rules(tmp_path, monkeypatch):
    """Scanning a SUBDIRECTORY of a repo still honors the repo's ignore
    files above the walk root (the `ignore` crate's parents behavior)."""
    gf = tmp_path / "global_ignore"
    monkeypatch.setenv("PERCEIVE_TPU_GLOBAL_GITIGNORE", str(gf))
    root = tmp_path / "repo"
    _make_repo_tree(root, gf)

    native, python = _both_walks(root / "docs")
    rel = {os.path.relpath(p, root / "docs") for p in python}
    assert rel == {"readme.md"}, f"parent rules not inherited: {rel}"
    if native is not None:
        assert native == python


def test_no_global_env_means_no_global_rules(tmp_path, monkeypatch):
    """An empty override disables the global file (and a missing one must
    not crash the walk)."""
    monkeypatch.setenv("PERCEIVE_TPU_GLOBAL_GITIGNORE", "")
    root = tmp_path / "r2"
    root.mkdir()
    (root / "a.xyz").write_text("a")
    native, python = _both_walks(root)
    assert {os.path.basename(p) for p in python} == {"a.xyz"}
    if native is not None:
        assert native == python


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
