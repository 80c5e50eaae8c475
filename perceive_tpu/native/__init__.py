"""Native (C++) host-runtime components, bound via ctypes.

The compute path is JAX/Pallas; these are the host-side pieces where the
reference leaned on native code and Python would bottleneck the feeder.
Currently: ``fastwalk`` — the parallel gitignore-aware directory walker
(reference `ignore` crate, fs.rs:42-45).

The shared object builds on demand with g++ the first time it's needed and
is cached next to the source; every consumer falls back to the pure-Python
implementation when no toolchain is available, so the native layer is an
accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastwalk.cpp")
_SO = os.path.join(_DIR, "_fastwalk.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _SO,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        print(f"fastwalk build failed:\n{proc.stderr}", file=sys.stderr)
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fw_walk.restype = ctypes.POINTER(ctypes.c_char)
        lib.fw_walk.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.fw_free.argtypes = [ctypes.POINTER(ctypes.c_char)]
        _lib = lib
        return _lib


def fastwalk_available() -> bool:
    return _load() is not None


def fastwalk(
    root: str, *, threads: int = 8, respect_gitignore: bool = True
) -> Optional[list[tuple[str, int, int]]]:
    """Walk ``root`` in parallel; [(path, mtime, atime)] for regular files,
    hidden and gitignored entries pruned.  None when the native library is
    unavailable (callers use the Python walk)."""
    lib = _load()
    if lib is None:
        return None
    out_len = ctypes.c_longlong(0)
    buf = lib.fw_walk(
        os.fspath(root).encode(), int(threads), int(respect_gitignore), ctypes.byref(out_len)
    )
    if not buf:
        return None
    try:
        data = ctypes.string_at(buf, out_len.value).decode("utf-8", "surrogateescape")
    finally:
        lib.fw_free(buf)
    entries = []
    # records are "mtime\tatime\tpath\0": the NUL terminator and path-last
    # layout keep filenames containing tabs/newlines parseable
    for rec in data.split("\0"):
        if not rec:
            continue
        mtime, atime, path = rec.split("\t", 2)
        entries.append((path, int(mtime), int(atime)))
    return entries
