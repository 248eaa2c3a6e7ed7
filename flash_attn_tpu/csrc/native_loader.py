"""ctypes bridge to the native C++ data loader (dataloader.cpp).

Builds the shared library with g++ on first use (cached next to the source);
every entry point degrades to None/numpy gracefully if the toolchain or
build is unavailable, so the framework never hard-depends on it.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cpp")
_SO = os.path.join(_HERE, "_dataloader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.tl_open.restype = ctypes.c_void_p
            lib.tl_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.tl_close.argtypes = [ctypes.c_void_p]
            lib.tl_num_items.restype = ctypes.c_long
            lib.tl_num_items.argtypes = [ctypes.c_void_p]
            lib.tl_fill_batch.restype = ctypes.c_int
            lib.tl_fill_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                ctypes.c_int, ctypes.c_long, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


class _Handle:
    def __init__(self, lib, ptr):
        self.lib = lib
        self.ptr = ptr

    def __del__(self):
        try:
            if self.ptr:
                self.lib.tl_close(self.ptr)
        except Exception:
            pass


def open_token_file(path: str, item_size: int):
    lib = _get_lib()
    if lib is None:
        return None
    ptr = lib.tl_open(path.encode(), item_size)
    return _Handle(lib, ptr) if ptr else None


def fill_batch(handle: "_Handle", starts: np.ndarray, window: int, dtype):
    n = len(starts)
    out = np.empty((n, window), dtype=dtype)
    starts64 = np.ascontiguousarray(starts, dtype=np.int64)
    rc = handle.lib.tl_fill_batch(
        handle.ptr,
        starts64.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n, window, out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise IndexError("token window out of bounds")
    return out
