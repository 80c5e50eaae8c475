"""`perceive-tpu doctor` — production environment self-check.

The reference had nothing like this (debugging a broken install meant
reading panics); a TPU deployment has more to get wrong — device plugin,
HBM, checkpoint layout, jit cache, native walker toolchain — so the
doctor walks every dependency the serving stack needs and prints a
✓/!/✗ line for each, exiting non-zero only on hard failures.

Deliberately does NOT build AppState: no model load, no device matrix —
each check is independent and cheap, so the doctor works precisely when
the app doesn't.
"""

from __future__ import annotations

import os
import sqlite3
import sys
import time
import zipfile
from pathlib import Path

OK, WARN, FAIL = "ok", "warn", "fail"
_MARK = {OK: "  ✓", WARN: "  !", FAIL: "  ✗"}


class _Report:
    def __init__(self) -> None:
        self.rows: list[tuple[str, str, str]] = []

    def add(self, status: str, name: str, detail: str = "") -> None:
        self.rows.append((status, name, detail))
        print(f"{_MARK[status]} {name}" + (f": {detail}" if detail else ""),
              flush=True)

    @property
    def failed(self) -> bool:
        return any(s == FAIL for s, _, _ in self.rows)


def _check_device(rep: _Report) -> None:
    try:
        import jax

        devs = jax.devices()
        d = devs[0]
        detail = f"{len(devs)} device(s), platform {d.platform}, {d.device_kind}"
        try:
            stats = d.memory_stats() or {}
            if stats.get("bytes_limit"):
                detail += f", HBM {stats['bytes_limit'] / 2**30:.1f} GB"
        except Exception:  # noqa: BLE001 — tunnel backends expose no stats
            pass
        rep.add(OK, "device", detail)
        if d.platform == "cpu":
            rep.add(WARN, "device platform",
                    "CPU backend — fine for tests, not for production latency")
        # compile+dispatch smoke: a degraded chip (post-OOM) turns trivial
        # compiles into minutes; surface that before a user blames the app
        t0 = time.perf_counter()
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jax.jit(lambda x: x * 2 + 1)(jnp.arange(8.0)))
        dt = time.perf_counter() - t0
        if dt > 120:
            rep.add(WARN, "compile smoke",
                    f"{dt:.0f}s for a trivial jit (device init + compile) — "
                    "unusually slow; a recent OOM/killed process degrades the "
                    "device for a while, expect minutes-long first compiles")
        else:
            rep.add(OK, "compile smoke", f"{dt:.1f}s")
    except Exception as e:  # noqa: BLE001
        rep.add(FAIL, "device", f"jax unavailable: {e}")


def _check_models(rep: _Report) -> None:
    from ..models.registry import ModelType, checkpoint_path, model_data_dir

    root = model_data_dir()
    present = []
    for mt in ModelType:
        if checkpoint_path(mt):
            present.append(mt.value)
    if present:
        rep.add(OK, "checkpoints", f"{len(present)} under {root}: "
                + ", ".join(present[:4]) + ("…" if len(present) > 4 else ""))
    else:
        rep.add(WARN, "checkpoints",
                f"none under {root} — the CLI falls back to a random-weight "
                "encoder (rankings meaningless); run scripts/install_models.py "
                "on a networked machine")
    try:
        from ..models.tokenize import TextTokenizer  # noqa: F401

        import tokenizers  # noqa: F401

        rep.add(OK, "tokenizers", tokenizers.__version__)
    except Exception as e:  # noqa: BLE001
        rep.add(FAIL, "tokenizers", str(e))


def _check_native(rep: _Report) -> None:
    try:
        from .. import native

        if native.fastwalk_available():
            rep.add(OK, "native walker", "fastwalk loaded")
        else:
            rep.add(WARN, "native walker",
                    "C++ fastwalk unavailable (no g++?); Python fallback is "
                    "correct but slower on huge trees")
    except Exception as e:  # noqa: BLE001
        rep.add(WARN, "native walker", f"{e} (Python fallback active)")
    for mod in ("zstandard", "lxml", "yaml"):
        try:
            __import__(mod)
            rep.add(OK, mod)
        except Exception as e:  # noqa: BLE001
            sev = FAIL if mod == "zstandard" else WARN
            rep.add(sev, mod, f"import failed: {e}")


def _check_db(rep: _Report, db_path: str | None) -> None:
    from ..paths import database_path

    path = Path(db_path) if db_path else database_path()
    if not Path(path).exists():
        rep.add(WARN, "database", f"{path} does not exist yet (created on "
                "first `source add`)")
        return
    try:
        conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        try:
            integ = conn.execute("PRAGMA integrity_check").fetchone()[0]
            if integ != "ok":
                rep.add(FAIL, "database integrity", integ)
                return
            mode = conn.execute("PRAGMA journal_mode").fetchone()[0]
            n_sources = conn.execute("SELECT COUNT(*) FROM sources").fetchone()[0]
            n_items = conn.execute("SELECT COUNT(*) FROM items").fetchone()[0]
            n_emb = conn.execute("SELECT COUNT(*) FROM item_embeddings").fetchone()[0]
            rep.add(OK, "database",
                    f"{path} ({mode}), {n_sources} sources, {n_items} items, "
                    f"{n_emb} embeddings")
            try:
                shards = conn.execute(
                    "SELECT model_id, model_version, path, rows "
                    "FROM vector_shards"
                ).fetchall()
            except sqlite3.OperationalError:
                # a reference-built perceive database has the same core
                # tables but no vector_shards manifest — valid input for
                # `import-db`, so don't FAIL the whole database check on it
                rep.add(WARN, "snapshot",
                        "no vector_shards table — a reference (pre-import) "
                        "database; run `import-db` to bring it in")
                shards = []
            for mid, mv, spath, srows in shards:
                if not Path(spath).exists():
                    rep.add(WARN, "snapshot",
                            f"model {mid} v{mv}: manifest points at missing "
                            f"{spath} — startup falls back to a full (slower) "
                            "rebuild from SQLite")
                    continue
                total = conn.execute(
                    "SELECT COUNT(*) FROM item_embeddings WHERE model_id = ? "
                    "AND model_version = ?", (mid, mv)
                ).fetchone()[0]
                backlog = max(0, total - srows)
                detail = f"model {mid} v{mv}: {srows} rows in {spath}"
                # format probe from the zip directory alone (no data read):
                # v1 bases (or payload-less v2) stream+re-quantize at load;
                # a fresh `snapshot` upgrades them to the adopt fast path
                # (save_snapshot skips the delta shortcut on pre-v2 bases,
                # so one re-save really does rewrite the base)
                try:
                    with zipfile.ZipFile(spath) as zf:
                        members = set(zf.namelist())
                    # (bf16/f32 v2 bases carry no q_ members by design —
                    # only the missing fmt marker means a v1 base)
                    old_fmt = "fmt.npy" not in members
                except Exception:  # noqa: BLE001 — corrupt/truncated zip
                    # startup will hit the same error and silently fall back
                    # to a full rebuild — surface it here, same class as the
                    # missing-file WARN above (review r3)
                    rep.add(WARN, "snapshot", detail + " is unreadable "
                            "(corrupt/truncated zip) — startup falls back to "
                            "a full (slower) rebuild; run `snapshot` to "
                            "rewrite it")
                    continue
                if backlog > max(1000, srows // 4):
                    extra = (" (also a v1 base — the same `snapshot` run "
                             "upgrades it to the fast-adopt format)"
                             if old_fmt else "")
                    rep.add(WARN, "snapshot", detail + f", ~{backlog} newer "
                            "rows replay from SQLite at startup — run "
                            "`snapshot` to refresh" + extra)
                elif old_fmt:
                    # WARN, not an OK-line suffix: the v1 base costs the
                    # same slow-startup class as the replay backlog above,
                    # and grep/CI consumers only see `!` rows (review r3)
                    rep.add(WARN, "snapshot", detail + " is a v1 base — run "
                            "`snapshot` once to upgrade to the fast-adopt "
                            "format")
                else:
                    rep.add(OK, "snapshot", detail)
            # every blob of one (model_id, model_version) must be the same
            # byte length (one vector dim): mixed lengths mean corruption
            # or rows written by a different-dim encoder under the same
            # identity — Searcher.build would crash on them at startup
            for mid, mv, lo_len, hi_len in conn.execute(
                """SELECT model_id, model_version,
                          MIN(LENGTH(embedding)), MAX(LENGTH(embedding))
                   FROM item_embeddings GROUP BY model_id, model_version"""
            ).fetchall():
                if lo_len != hi_len:
                    rep.add(WARN, "embedding dims",
                            f"model {mid} v{mv}: blob sizes vary "
                            f"({lo_len}-{hi_len} bytes) — mixed-dimension "
                            "rows under one model identity; delete the "
                            "stray rows or re-scan")
            orphans = conn.execute(
                """SELECT COUNT(*) FROM items
                   LEFT JOIN item_embeddings ie ON ie.item_id = items.id
                   WHERE items.skipped IS NULL AND items.hidden_at IS NULL
                     AND ie.item_id IS NULL"""
            ).fetchone()[0]
            if orphans:
                rep.add(WARN, "unembedded items",
                        f"{orphans} live items have no embedding row — a scan "
                        "was interrupted; re-run `source scan` to finish")
        finally:
            conn.close()
    except Exception as e:  # noqa: BLE001
        rep.add(FAIL, "database", f"{path}: {e}")


def _check_jit_cache(rep: _Report) -> None:
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if d and Path(d).is_dir():
        n = sum(1 for _ in Path(d).iterdir())
        rep.add(OK, "jit cache", f"{d} ({n} entries)")
    else:
        rep.add(WARN, "jit cache",
                "no persistent compilation cache dir — every process pays "
                "full first-compiles (the serve/CLI paths enable one on TPU "
                "automatically; set JAX_COMPILATION_CACHE_DIR to share it)")


def doctor(db_path: str | None = None) -> int:
    """Run all checks; returns a process exit code (0 unless a FAIL)."""
    rep = _Report()
    print("perceive-tpu doctor", flush=True)
    _check_device(rep)
    _check_models(rep)
    _check_native(rep)
    _check_db(rep, db_path)
    _check_jit_cache(rep)
    fails = sum(1 for s, _, _ in rep.rows if s == FAIL)
    warns = sum(1 for s, _, _ in rep.rows if s == WARN)
    print(f"{len(rep.rows)} checks: {fails} failed, {warns} warnings", flush=True)
    return 1 if rep.failed else 0
