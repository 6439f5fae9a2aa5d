"""ctypes bindings to the native TIFF runtime (native/tiffio.cpp).

Builds the shared library on first use (g++ is baked into the image;
pybind11 is not, hence the C ABI + ctypes).  Falls back to the PIL reader
transparently when the toolchain or format support is unavailable, so the
pure-python path always works.

The prefetching iterator overlaps host TIFF decode with device compute —
the reference loads frames synchronously in its per-sample loop
(XLFMDataset.py:140-162) which SURVEY.md §7 flags as the startup bottleneck.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_DTYPES = {1: np.uint8, 2: np.uint16, 3: np.float32}
_DTYPE_CODES = {np.dtype(np.uint8): 1, np.dtype(np.uint16): 2,
                np.dtype(np.float32): 3}


def _load_library():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so = os.path.join(_NATIVE_DIR, "libcwfa_tiffio.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True)
            except Exception:
                _LIB = False
                return _LIB
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _LIB = False
            return _LIB
        lib.tiff_open.restype = ctypes.c_void_p
        lib.tiff_open.argtypes = [ctypes.c_char_p]
        lib.tiff_num_pages.argtypes = [ctypes.c_void_p]
        lib.tiff_page_info.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.tiff_read_page.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_char_p]
        lib.tiff_close.argtypes = [ctypes.c_void_p]
        lib.tiff_write.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_int, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_int]
        lib.prefetch_start.restype = ctypes.c_void_p
        lib.prefetch_start.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.c_int, ctypes.c_int]
        lib.prefetch_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.prefetch_error.restype = ctypes.c_char_p
        lib.prefetch_error.argtypes = [ctypes.c_void_p]
        lib.prefetch_stop.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return bool(_load_library())


def read_tiff_stack_native(path: str, pages=None,
                           dtype=np.float32) -> np.ndarray | None:
    """Native multipage read; returns None if unsupported (caller falls back
    to the PIL reader).  dtype=None preserves the file's native dtype."""
    lib = _load_library()
    if not lib:
        return None
    h = lib.tiff_open(path.encode())
    if not h:
        return None
    try:
        n = lib.tiff_num_pages(h)
        page_list = list(range(n)) if pages is None else [p for p in pages
                                                          if 0 <= p < n]
        dims = (ctypes.c_int64 * 2)()
        dt = ctypes.c_int()
        out = []
        for p in page_list:
            if lib.tiff_page_info(h, p, dims, ctypes.byref(dt)) != 0:
                return None
            arr = np.empty((dims[0], dims[1]), _DTYPES[dt.value])
            if lib.tiff_read_page(
                    h, p, arr.ctypes.data_as(ctypes.c_char_p)) != 0:
                return None
            out.append(arr)
        if not out:
            return None
        stacked = np.stack(out)
        return stacked if dtype is None else stacked.astype(dtype)
    finally:
        lib.tiff_close(h)


def write_tiff_stack_native(path: str, stack: np.ndarray) -> bool:
    lib = _load_library()
    if not lib:
        return False
    stack = np.ascontiguousarray(stack)
    if stack.ndim == 2:
        stack = stack[None]
    code = _DTYPE_CODES.get(stack.dtype)
    if code is None:
        stack = stack.astype(np.float32)
        code = 3
    rc = lib.tiff_write(path.encode(), stack.ctypes.data_as(ctypes.c_char_p),
                        stack.shape[0], stack.shape[1], stack.shape[2], code)
    return rc == 0


class PrefetchingTiffReader:
    """Iterate a multipage TIFF with a background decode thread.

    with PrefetchingTiffReader(path, pages) as it:
        for page_ix, frame in it: ...
    """

    def __init__(self, path: str, pages=None, depth: int = 2):
        lib = _load_library()
        if not lib:
            raise RuntimeError("native tiff runtime unavailable")
        self._lib = lib
        self._h = lib.tiff_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        n = lib.tiff_num_pages(self._h)
        self._pages = list(range(n)) if pages is None else [p for p in pages
                                                            if 0 <= p < n]
        if not self._pages:
            lib.tiff_close(self._h)
            raise IOError(f"no pages selected from {path!r} "
                          f"(requested {pages!r} of {n})")
        dims = (ctypes.c_int64 * 2)()
        dt = ctypes.c_int()
        if lib.tiff_page_info(self._h, self._pages[0], dims,
                              ctypes.byref(dt)) != 0:
            lib.tiff_close(self._h)
            raise IOError("unsupported tiff layout for native reader")
        self._shape = (dims[0], dims[1])
        self._dtype = _DTYPES[dt.value]
        arr = (ctypes.c_int * len(self._pages))(*self._pages)
        self._pf = lib.prefetch_start(self._h, arr, len(self._pages), depth)
        if not self._pf:
            lib.tiff_close(self._h)
            self._h = None
            raise IOError(f"prefetch start failed for {path!r} "
                          f"(invalid first page {self._pages[0]})")

    def __enter__(self):
        return self

    def __iter__(self):
        for _ in range(len(self._pages)):
            buf = np.empty(self._shape, self._dtype)
            ix = self._lib.prefetch_next(
                self._pf, buf.ctypes.data_as(ctypes.c_char_p))
            if ix < 0:
                # a mid-stream decode failure must not read as a SHORTER
                # dataset — the deconvolve CLI would silently produce
                # fewer volumes on a corrupt stack
                err = self._lib.prefetch_error(self._pf)
                if err:
                    raise IOError(f"native tiff prefetch failed: "
                                  f"{err.decode()}")
                break
            yield ix, buf

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._pf:
            self._lib.prefetch_stop(self._pf)
            self._pf = None
        if self._h:
            self._lib.tiff_close(self._h)
            self._h = None
