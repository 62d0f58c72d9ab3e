"""ctypes bindings for the native C++ CSV loader, with build-on-first-use.

The shared library is compiled once from csv_loader.cc into this package
directory (g++ is part of the toolchain); every consumer goes through
`load_eod` / `load_eod_many`, and `available()` gates callers so a missing
compiler degrades gracefully to the pandas path (data/loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csv_loader.cc")
_LIB = os.path.join(_HERE, "libcsvloader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _EodTable(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("dates", ctypes.POINTER(ctypes.c_int64)),
        ("open", ctypes.POINTER(ctypes.c_double)),
        ("high", ctypes.POINTER(ctypes.c_double)),
        ("low", ctypes.POINTER(ctypes.c_double)),
        ("close", ctypes.POINTER(ctypes.c_double)),
        ("adjusted_close", ctypes.POINTER(ctypes.c_double)),
        ("volume", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char_p),
    ]


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
        "-o", _LIB, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None


def _get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if _build() is None:
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.eod_parse.restype = ctypes.POINTER(_EodTable)
        lib.eod_parse.argtypes = [ctypes.c_char_p]
        lib.eod_free.argtypes = [ctypes.POINTER(_EodTable)]
        lib.eod_parse_many.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(_EodTable)), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def _table_to_dict(lib, ptr):
    t = ptr.contents
    try:
        if t.error:
            raise IOError(t.error.decode())
        n = t.n_rows
        out = {
            "dates": np.ctypeslib.as_array(t.dates, shape=(n,)).copy(),
        }
        for name in ("open", "high", "low", "close", "adjusted_close", "volume"):
            out[name] = np.ctypeslib.as_array(getattr(t, name), shape=(n,)).copy()
        return out
    finally:
        lib.eod_free(ptr)


def load_eod(path: str) -> dict:
    """Parse one EOD CSV into numpy columns; `dates` are int64 days since
    the unix epoch."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    return _table_to_dict(lib, lib.eod_parse(path.encode()))


def load_eod_many(paths: Sequence[str], n_threads: int = 8) -> list:
    """Threaded multi-file load — the reference's per-asset sequential reads
    (Multi-Input_GPR/main.py:535 loop) become one parallel native call."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    out = (ctypes.POINTER(_EodTable) * n)()
    lib.eod_parse_many(arr, n, out, n_threads)
    return [_table_to_dict(lib, out[i]) for i in range(n)]
