"""Native IO runtime: ctypes bindings over libsfio (runtime/sfio.cpp).

Compiled lazily with g++ on first use and cached under
``streamflow_tpu/runtime/_build``; every entry point degrades gracefully to
the NumPy codecs in data/frame_utils.py when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_BUILD = _HERE / "_build"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile() -> Optional[Path]:
    so = _BUILD / "libsfio.so"
    src = _HERE / "sfio.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    _BUILD.mkdir(exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", str(src),
           "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        lib.sfio_flo_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.sfio_read_flo.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32]
        lib.sfio_read_flo_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32]
        lib.sfio_ppm_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.sfio_read_ppm.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32]
        _LIB = lib
        return _LIB


def read_flo_native(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.sfio_flo_header(str(path).encode(), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.sfio_read_flo(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h)
    return out if rc == 0 else None


def read_flo_batch_native(paths: List[str]) -> Optional[np.ndarray]:
    """Decode N same-sized .flo files in parallel on the C++ thread pool.
    Returns (N, H, W, 2) or None on any failure/mismatch."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.sfio_flo_header(str(paths[0]).encode(), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        return None
    out = np.empty((len(paths), h.value, w.value, 2), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[str(p).encode() for p in paths])
    rc = lib.sfio_read_flo_batch(
        arr, len(paths),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h)
    return out if rc == 0 else None


def read_ppm_native(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    if lib.sfio_ppm_header(str(path).encode(), ctypes.byref(w),
                           ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.sfio_read_ppm(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h)
    return out if rc == 0 else None
