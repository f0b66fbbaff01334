"""Run-directory log capture.

The reference redirects all run output to a timestamped file in the run dir
(ltr_adhoc/eval/ltr.py:242-244, ltr_tree/eval/ltr_tree.py:206,
ltr_diversification/eval/ltr_diversification.py:260-262) by REPLACING
sys.stdout, so nothing reaches the console. Here a tee writes the same
stream to both the console and `log_<timestamp>.txt` in the run dir — long
grid runs leave an on-disk record of every per-epoch line without going
silent.
"""

from __future__ import annotations

import contextlib
import datetime
import os
import sys
from typing import Iterator, Optional


class _Tee:
    """File-like object duplicating writes to a console stream and a file.

    Python-level writes only: `fileno()` exposes the real console fd (so
    subprocess(stdout=sys.stdout) and C-level printers keep working), which
    means FD-LEVEL output — subprocesses, native-tool prints, XLA C++ logs —
    reaches the console but bypasses the log file. Same contract as the
    reference's sys.stdout replacement (it loses fd-level output entirely)."""

    def __init__(self, console, logfile):
        self._console = console
        self._file = logfile

    def write(self, s: str) -> int:
        n = self._console.write(s)
        self._file.write(s)
        return n

    def writelines(self, lines) -> None:
        for s in lines:
            self.write(s)

    def flush(self) -> None:
        self._console.flush()
        self._file.flush()

    def isatty(self) -> bool:
        return self._console.isatty()

    def fileno(self) -> int:
        return self._console.fileno()

    @property
    def buffer(self):
        # binary-mode callers fall through to the console; the log captures
        # text-mode output only (see class docstring)
        return getattr(self._console, "buffer", self._console)


@contextlib.contextmanager
def run_log(dir_run: Optional[str], enabled: bool = True,
            debug: bool = False) -> Iterator[Optional[str]]:
    """Tee stdout to `<dir_run>/log_<YYYY_mm_dd_HH_MM>.txt` while active.

    Mirrors the reference's do_log guard (no capture in debug mode,
    ltr.py:242); yields the log path (None when disabled). Nested use is
    safe — the inner context layers another tee and unwinds in order.
    """
    if not enabled or debug or not dir_run:
        yield None
        return
    os.makedirs(dir_run, exist_ok=True)
    time_str = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M")
    path = os.path.join(dir_run, f"log_{time_str}.txt")
    # append: several folds/grid points within one run share the file
    f = open(path, "a", encoding="utf-8")
    prev = sys.stdout
    sys.stdout = _Tee(prev, f)
    try:
        yield path
    finally:
        sys.stdout = prev
        f.close()
