"""Native (C++) components, loaded via ctypes.

Build with ``python setup.py build_ext --inplace`` or just import —
:func:`load_library` compiles on demand with g++ if the shared object is
missing (no external dependencies; ~2s).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_SO = _DIR / "libbgu_solver.so"
_SRC = _DIR / "bgu_solver.cpp"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build() -> Path:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            build()
        lib = ctypes.CDLL(str(_SO))
        dp = ctypes.POINTER(ctypes.c_double)
        lib.bgu_fit_native.restype = ctypes.c_int
        lib.bgu_fit_native.argtypes = [
            dp, dp, dp, dp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, dp,
        ]
        lib.bgu_slice_native.restype = None
        lib.bgu_slice_native.argtypes = [
            dp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            dp, dp, ctypes.c_int, ctypes.c_int, dp,
        ]
        _lib = lib
        return lib
