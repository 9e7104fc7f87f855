"""Lazy ctypes build/load of the native kernels (no pybind11 in this image;
plain C + ctypes keeps the ABI trivial)."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "fnv.c"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> Path:
    return Path(__file__).parent / "_fnv.so"


def _build() -> Optional[Path]:
    so = _so_path()
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-pthread", str(_SRC),
                 "-o", str(so)],
                check=True, capture_output=True, timeout=120)
            return so
        except (OSError, subprocess.SubprocessError) as e:
            log.debug("native build with %s failed: %s", cc, e)
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            log.info("native tier unavailable (no C compiler); "
                     "falling back to NumPy/Python paths")
            return None
        lib = ctypes.CDLL(str(so))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.fnv1_32_batch.argtypes = [u8p, i64p, ctypes.c_int64, u32p]
        lib.fnv1a_32_batch.argtypes = [u8p, i64p, ctypes.c_int64, u32p]
        lib.hash_bucket_batch.argtypes = [u8p, i64p, ctypes.c_int64,
                                          ctypes.c_int32, i32p]
        lib.multihot_batch.argtypes = [u8p, i64p, ctypes.c_int64,
                                       ctypes.c_uint8, ctypes.c_int32, f32p]
        lib.gather_rows.argtypes = [f32p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, f32p, ctypes.c_int64,
                                    ctypes.c_int64]
        for fn in (lib.fnv1_32_batch, lib.fnv1a_32_batch,
                   lib.hash_bucket_batch, lib.multihot_batch,
                   lib.gather_rows):
            fn.restype = None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_lib() is not None
