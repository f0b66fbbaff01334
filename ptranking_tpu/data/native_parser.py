"""ctypes binding for the native LETOR parser (native/letor_parser.cpp).

`parse_letor_file_native(path, ...)` returns the same
(features [R, F], labels [R], qids list[, docids list]) as the pure-Python
`parse_letor_lines` (data/letor.py) but parses in C++ — the hot path for
MSLR/Istella-scale corpora. Falls back to None when no C++ toolchain exists;
`load_letor_file` uses it transparently and keeps the Python path as oracle.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        from ptranking_tpu.utils.native_build import build_native

        src = os.path.join(_NATIVE_DIR, "letor_parser.cpp")
        out = os.path.join(_NATIVE_DIR, "build", "libletor_parser.so")
        try:
            built = build_native(src, out, extra_flags=["-shared", "-fPIC"])
            if built is None:
                raise RuntimeError("no C++ compiler or missing source")
            lib = ctypes.CDLL(built)
            lib.letor_parse.restype = ctypes.c_void_p
            lib.letor_parse.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
            lib.letor_dims.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.letor_fill.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_char_p, ctypes.c_char_p,
            ]
            lib.letor_close.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
            _LIB = None
        return _LIB


def native_parser_available() -> bool:
    return _build_and_load() is not None


def parse_letor_file_native(
    path: str,
    has_targets: bool = True,
    one_indexed: bool = True,
    has_comment: bool = False,
):
    """Parse with the C++ library; returns the parse_letor_lines tuple or
    None when the native library is unavailable or rejects the file."""
    lib = _build_and_load()
    if lib is None:
        return None
    handle = lib.letor_parse(path.encode(), int(one_indexed), int(has_targets))
    if not handle:
        return None
    try:
        rows = ctypes.c_int64()
        F = ctypes.c_int32()
        qb = ctypes.c_int64()
        db = ctypes.c_int64()
        hd = ctypes.c_int32()
        lib.letor_dims(handle, ctypes.byref(rows), ctypes.byref(F),
                       ctypes.byref(qb), ctypes.byref(db), ctypes.byref(hd))
        R, nf = rows.value, F.value
        feats = np.zeros((R, nf), np.float32)
        labels = np.zeros((R,), np.float32)
        qbuf = ctypes.create_string_buffer(max(qb.value, 1))
        dbuf = ctypes.create_string_buffer(max(db.value, 1))
        lib.letor_fill(
            handle,
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            qbuf, dbuf,
        )
        qids = qbuf.raw[: qb.value].decode().split("\0")[:-1] if qb.value else []
        if has_comment:
            docids: List[str] = (
                dbuf.raw[: db.value].decode().split("\0")[:-1] if db.value else []
            )
            return feats, labels, qids, docids
        return feats, labels, qids
    finally:
        lib.letor_close(handle)
