"""Multi-page TIFF I/O via PIL (tifffile is not in this image; PIL reads and
writes multipage uint16/float32 TIFF stacks, which covers the reference's
formats: XLFM_image_stack.tif camera stacks and per-frame volume stacks,
XLFMDataset.py:85-122)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_tiff_stack(path: str, pages=None) -> np.ndarray:
    """Read a multipage TIFF into (n_pages, H, W) float32.

    Uses the native C++ reader (native/tiffio.cpp) when available, falling
    back to PIL for formats it doesn't cover.

    pages: optional list of page indices to read (the reference's
    images_to_use ``key=`` selection, XLFMDataset.py:92)."""
    try:
        from cwfa_tpu.data.native_tiff import read_tiff_stack_native
        out = read_tiff_stack_native(path, pages)
        if out is not None:
            return out
    except Exception:
        pass
    im = Image.open(path)
    n = getattr(im, "n_frames", 1)
    if pages is None:
        pages = range(n)
    out = []
    for i in pages:
        if i >= n:
            break
        im.seek(i)
        out.append(np.asarray(im, dtype=np.float32))
    return np.stack(out)


def count_tiff_pages(path: str) -> int:
    """Number of pages in a multipage TIFF (cheap: header walk only)."""
    im = Image.open(path)
    return int(getattr(im, "n_frames", 1))


def write_tiff_stack(path: str, stack: np.ndarray):
    """Write (D, H, W) float32 or uint16 array as a multipage TIFF.

    Uses the native C++ writer (native/tiffio.cpp) when available — PIL
    serializes ~100 MB volume stacks at host-bound speed, which would
    bottleneck the streaming service."""
    stack = np.asarray(stack)
    if stack.ndim == 2:
        stack = stack[None]
    if stack.dtype in (np.float64, np.float16):
        stack = stack.astype(np.float32)
    try:
        from cwfa_tpu.data.native_tiff import write_tiff_stack_native
        if write_tiff_stack_native(path, stack):
            return
    except Exception:
        pass
    mode = "F" if stack.dtype == np.float32 else None
    pages = [Image.fromarray(p, mode=mode) for p in stack]
    pages[0].save(path, format="TIFF", save_all=True, append_images=pages[1:])
