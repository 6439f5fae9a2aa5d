"""Multi-page TIFF I/O via PIL (tifffile is not in this image; PIL reads and
writes multipage uint16/float32 TIFF stacks, which covers the reference's
formats: XLFM_image_stack.tif camera stacks and per-frame volume stacks,
XLFMDataset.py:85-122)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def read_tiff_stack(path: str, pages=None, dtype=np.float32) -> np.ndarray:
    """Read a multipage TIFF into (n_pages, H, W) arrays of ``dtype``
    (default float32; ``dtype=None`` preserves the file's native dtype —
    the serving feed path keeps uint16 camera frames 2 bytes/px across
    the wire and casts on device).

    Uses the native C++ reader (native/tiffio.cpp) when available, falling
    back to PIL for formats it doesn't cover.

    pages: optional list of page indices to read (the reference's
    images_to_use ``key=`` selection, XLFMDataset.py:92)."""
    try:
        from cwfa_tpu.data.native_tiff import read_tiff_stack_native
        out = read_tiff_stack_native(path, pages, dtype=dtype)
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
        if not 0 <= i < n:
            continue    # skip-not-stop: the native reader FILTERS invalid
            # pages, so an early break here would make the loaded frame
            # set depend on which reader is available
        im.seek(i)
        page = np.asarray(im) if dtype is None \
            else np.asarray(im, dtype=dtype)
        if page.size == 0:
            # a corrupt IFD can claim a page PIL renders as 0-size; a
            # silent (N, 0, 0) stack would surface as NaN statistics far
            # from the cause (found by tests/test_tiff_fuzz.py)
            raise ValueError(f"empty page {i} in {path!r} (corrupt TIFF?)")
        out.append(page)
    if not out:
        raise ValueError(
            f"no pages selected from {path!r}: requested {list(pages)!r} "
            f"of {n} available (empty images_to_use or all out of range)")
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


class BackgroundTiffWriter:
    """Background thread draining (path, array) TIFF-write jobs from a
    bounded queue, so ~100 MB volume serialization overlaps device compute
    instead of adding to it.  Shared by the streaming reconstruction
    service (engine/serving.serve_directory) and the evaluator
    (engine/trainer.evaluate).

    Failure contract: a write exception is recorded and surfaced on the
    NEXT put()/close() on the caller's thread (a silently-dead writer
    would deadlock the bounded queue); after a failure remaining jobs are
    drained and dropped."""

    def __init__(self, maxsize: int = 16):
        import queue
        import threading
        self.errors: list = []
        self._q: "queue.Queue" = queue.Queue(maxsize=maxsize)
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self.errors:
                continue               # drain after failure
            path, arr, dtype = item
            try:
                if dtype is not None:
                    # dtype conversion on THIS thread: a ~100 MB astype on
                    # the producer thread would sit in the serving latency
                    # path the background writer exists to keep clear
                    arr = arr.astype(dtype, copy=False)
                write_tiff_stack(path, arr)
            except Exception as e:     # surfaced on the caller's thread
                self.errors.append(e)

    def _check(self):
        if self.errors:
            raise RuntimeError("volume writer failed") from self.errors[0]

    def put(self, path: str, arr: np.ndarray, dtype=None):
        self._check()
        self._q.put((path, arr, dtype))

    def close(self):
        """Flush remaining jobs, join the thread, surface any failure."""
        self._q.put(None)
        self._t.join()
        self._check()
