"""Desktop launcher installation — the installable-app analog.

The reference ships perceive as a Tauri desktop application
(/root/reference/crates/perceive-tauri/): a native window hosting a search
page that talks to the in-process engine over three RPCs.  The TPU build's
equivalent surface is ``perceive-tpu app`` (serve + the embedded web UI,
perceive_tpu/serve.py) — this module makes it *installable* like a desktop
app: it writes a freedesktop.org ``.desktop`` entry (Linux) or a clickable
``.command`` launcher (macOS) that starts the app and opens the UI.
"""

from __future__ import annotations

import os
import shlex
import stat
import sys
from pathlib import Path

_DESKTOP_ENTRY = """[Desktop Entry]
Type=Application
Name=Perceive TPU
Comment=Semantic search for your life (TPU-native)
Exec={exec_line}
Terminal=false
Categories=Utility;Office;
Keywords=search;semantic;index;
"""


def _exec_quote(arg: str) -> str:
    """Quote one Exec argument per the Desktop Entry Spec (double quotes +
    backslash escaping — shlex/POSIX single quotes are NOT valid there and
    spec-compliant launchers misparse them)."""
    if not any(c in arg for c in " \t\n\"'\\><~|&;$*?#()`"):
        return arg
    escaped = arg.replace("\\", "\\\\").replace('"', '\\"').replace("`", "\\`").replace("$", "\\$")
    return f'"{escaped}"'


def _launch_command(quote=_exec_quote) -> str:
    """The command the launcher runs: this interpreter + the CLI app mode."""
    return f"{quote(sys.executable)} -m perceive_tpu.cli app"


def install_desktop_entry(base_dir: str | None = None) -> str:
    """Write the launcher and return its path.

    Linux (XDG): ``~/.local/share/applications/perceive-tpu.desktop``.
    macOS: ``~/Applications/Perceive TPU.command`` (double-clickable).
    ``base_dir`` overrides the destination root (tests)."""
    if sys.platform == "darwin" and base_dir is None:
        dest = Path.home() / "Applications"
        dest.mkdir(parents=True, exist_ok=True)
        path = dest / "Perceive TPU.command"
        # a .command runs through sh — POSIX quoting is right here
        path.write_text(f"#!/bin/sh\nexec {_launch_command(shlex.quote)}\n")
        path.chmod(path.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
        return str(path)
    root = Path(base_dir) if base_dir is not None else (
        Path(os.environ.get("XDG_DATA_HOME") or Path.home() / ".local" / "share")
    )
    dest = root / "applications"
    dest.mkdir(parents=True, exist_ok=True)
    path = dest / "perceive-tpu.desktop"
    path.write_text(_DESKTOP_ENTRY.format(exec_line=_launch_command()))
    path.chmod(0o755)
    return str(path)
