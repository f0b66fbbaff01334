"""Shared build-on-demand helper for the native C++ components.

Used by metrics/ndeval.py (CLI binary) and data/native_parser.py (shared
library): finds a compiler, rebuilds when the source is newer, and builds
ATOMICALLY (compile to a temp path, then os.replace) under a process-wide
lock — concurrent callers (e.g. pytest-xdist workers) never exec or dlopen a
half-written artifact.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import threading
from typing import List, Optional

_LOCK = threading.Lock()


def _artifact_usable(out: str) -> bool:
    """Reject a stale artifact built for another platform (e.g. restored from
    a checkout with fresh mtimes): exec-probe binaries, dlopen-probe .so."""
    try:
        if out.endswith(".so"):
            import ctypes

            ctypes.CDLL(out)
        else:
            subprocess.run([out], capture_output=True, timeout=10)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False


def find_cxx() -> Optional[str]:
    return (os.environ.get("CXX") or shutil.which("g++")
            or shutil.which("c++") or shutil.which("clang++"))


def build_native(src: str, out: str, extra_flags: Optional[List[str]] = None,
                 rebuild: bool = False) -> Optional[str]:
    """Compile `src` to `out` if missing/stale; returns `out` or None when no
    toolchain exists. Raises on compile errors."""
    if not os.path.exists(src):
        return None
    with _LOCK:
        if not rebuild and os.path.exists(out) and \
                os.path.getmtime(out) >= os.path.getmtime(src) and \
                _artifact_usable(out):
            return out
        cxx = find_cxx()
        if cxx is None:
            return None
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = f"{out}.tmp.{os.getpid()}"
        cmd = [cxx, "-O3", "-std=c++17", *(extra_flags or []), "-o", tmp, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, out)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return out
