"""Loader for the native host-runtime library (csrc/spsp_native.c).

The library is built on demand with the system compiler into build/.
Python fallbacks exist for every entry point so the package works without
a toolchain, but the native path is authoritative for long-double math.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "spsp_native.c")
_LIB = os.path.join(_ROOT, "build", "libspsp_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    for cc in ("cc", "gcc", "g++", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC, "-lm"],
                capture_output=True)
            if r.returncode == 0:
                return True
        except FileNotFoundError:
            continue
    return False


def get_lib():
    """Return the loaded native library, building it if needed;
    None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not os.path.exists(_SRC):
                return None
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.spsp_threshold.restype = ctypes.c_uint64
        lib.spsp_threshold.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_double]
        lib.spsp_xxh64_u64.restype = ctypes.c_uint64
        lib.spsp_xxh64_u64.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        lib.spsp_walk_chain.restype = ctypes.c_int64
        lib.spsp_walk_chain.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_uint8,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def walk_chain_native(nxt_pos_a, nxt_adopt_a, nxt_pos_r, nxt_adopt_r,
                      init_pos: int, init_adopt: bool):
    """Fast event-chain walk over numpy successor tables.

    Returns (positions int32[], types uint8[]) or None if the native
    library is unavailable. Arrays must be C-contiguous int32/uint8.
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    n = nxt_pos_a.shape[0]
    max_out = n + 1
    out_pos = np.empty(max_out, dtype=np.int32)
    out_type = np.empty(max_out, dtype=np.uint8)
    cnt = lib.spsp_walk_chain(
        nxt_pos_a.ctypes.data, nxt_adopt_a.ctypes.data,
        nxt_pos_r.ctypes.data, nxt_adopt_r.ctypes.data,
        int(init_pos), 1 if init_adopt else 0,
        out_pos.ctypes.data, out_type.ctypes.data, max_out)
    return out_pos[:cnt], out_type[:cnt]


def threshold_native(k: int, m: int, s: float):
    """Exact FHS threshold via native long double; None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.spsp_threshold(k, m, float(s)))
