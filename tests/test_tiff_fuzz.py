"""Malformed-input robustness of the TIFF readers (native/tiffio.cpp via
data/native_tiff.py, PIL fallback in data/tiff.py).

The readers parse user-supplied files (the reference trusts tifffile for
this, XLFMDataset.py:85-122); a from-scratch C parser must degrade to a
Python exception — never a crash, hang, or silent garbage array — on
corrupt headers, truncated bodies, and bit-flipped IFDs."""

import os

import numpy as np
import pytest

from cwfa_tpu.data.native_tiff import (PrefetchingTiffReader,
                                       native_available,
                                       read_tiff_stack_native)
from cwfa_tpu.data.tiff import read_tiff_stack, write_tiff_stack


def _valid_tiff(tmp_path, name="ok.tif", pages=3, h=6, w=8):
    path = str(tmp_path / name)
    rng = np.random.RandomState(0)
    write_tiff_stack(path, rng.rand(pages, h, w).astype(np.float32))
    return path


def _expect_clean(path):
    """Reading a damaged file must either raise or return a real array."""
    try:
        out = read_tiff_stack(path)
    except Exception:
        return  # a Python exception is the contract
    assert isinstance(out, np.ndarray) and out.ndim == 3 and out.size > 0


def test_random_bytes(tmp_path):
    rng = np.random.RandomState(42)
    for i, size in enumerate([0, 1, 7, 64, 512, 4096]):
        p = str(tmp_path / f"junk{i}.tif")
        with open(p, "wb") as f:
            f.write(rng.bytes(size))
        _expect_clean(p)


def test_random_bytes_with_tiff_magic(tmp_path):
    # correct magic ("II*\0") followed by garbage exercises the IFD walker
    rng = np.random.RandomState(7)
    for i, size in enumerate([4, 16, 200, 2048]):
        p = str(tmp_path / f"magic{i}.tif")
        with open(p, "wb") as f:
            f.write(b"II*\x00" + rng.bytes(size))
        _expect_clean(p)


def test_truncations(tmp_path):
    src = _valid_tiff(tmp_path)
    data = open(src, "rb").read()
    for i, frac in enumerate([0.02, 0.1, 0.3, 0.6, 0.9, 0.99]):
        p = str(tmp_path / f"trunc{i}.tif")
        with open(p, "wb") as f:
            f.write(data[: max(1, int(len(data) * frac))])
        _expect_clean(p)


def test_bitflips(tmp_path):
    src = _valid_tiff(tmp_path)
    data = bytearray(open(src, "rb").read())
    rng = np.random.RandomState(3)
    for i in range(12):
        mut = bytearray(data)
        # cluster half the flips in the first 256 bytes (header + IFD) where
        # structural fields live; the rest anywhere
        n_hdr = min(256, len(mut))
        for _ in range(4):
            mut[rng.randint(n_hdr)] ^= 1 << rng.randint(8)
        for _ in range(4):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        p = str(tmp_path / f"flip{i}.tif")
        with open(p, "wb") as f:
            f.write(bytes(mut))
        _expect_clean(p)


def test_native_reader_direct(tmp_path):
    """The native path must return None/raise on damage, never crash, even
    without the PIL safety net in front."""
    if not native_available():
        pytest.skip("native tiff runtime unavailable")
    src = _valid_tiff(tmp_path)
    data = open(src, "rb").read()
    cases = []
    for i, frac in enumerate([0.05, 0.5, 0.95]):
        p = str(tmp_path / f"ntrunc{i}.tif")
        with open(p, "wb") as f:
            f.write(data[: int(len(data) * frac)])
        cases.append(p)
    rng = np.random.RandomState(9)
    for i in range(8):
        mut = bytearray(data)
        for _ in range(6):
            mut[rng.randint(min(256, len(mut)))] ^= 1 << rng.randint(8)
        p = str(tmp_path / f"nflip{i}.tif")
        with open(p, "wb") as f:
            f.write(bytes(mut))
        cases.append(p)
    for p in cases:
        try:
            out = read_tiff_stack_native(p)
        except Exception:
            continue
        assert out is None or (isinstance(out, np.ndarray) and out.size > 0)


def test_prefetcher_on_damaged_files(tmp_path):
    if not native_available():
        pytest.skip("native tiff runtime unavailable")
    src = _valid_tiff(tmp_path, pages=4)
    data = open(src, "rb").read()
    rng = np.random.RandomState(11)
    for i in range(6):
        mut = bytearray(data)
        for _ in range(5):
            mut[rng.randint(len(mut))] ^= 1 << rng.randint(8)
        p = str(tmp_path / f"pf{i}.tif")
        with open(p, "wb") as f:
            f.write(bytes(mut))
        try:
            with PrefetchingTiffReader(p) as it:
                for _, frame in it:
                    assert frame.size > 0
        except Exception:
            pass  # clean Python exception is the contract


def _ifd_tiff(dim_type, dim_val):
    """Minimal classic TIFF whose single IFD claims a dim_val² page backed
    by an 8-byte strip."""
    import struct
    entries = [
        (256, dim_type, 1, dim_val),   # ImageWidth
        (257, dim_type, 1, dim_val),   # ImageLength
        (258, 3, 1, 16),               # BitsPerSample
        (259, 3, 1, 1),                # Compression: none
        (262, 3, 1, 1),                # Photometric
        (273, 4, 1, 200),              # StripOffsets -> past the IFD
        (277, 3, 1, 1),                # SamplesPerPixel
        (278, dim_type, 1, dim_val),   # RowsPerStrip
        (279, 4, 1, 8),                # StripByteCounts: LIES (8 bytes)
        (339, 3, 1, 1),                # SampleFormat: uint
    ]
    buf = struct.pack("<2sHI", b"II", 42, 8)
    buf += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        buf += struct.pack("<HHII", tag, typ, cnt, val)
    buf += struct.pack("<I", 0)
    return buf.ljust(200, b"\0") + b"\x01\x02" * 4


@pytest.mark.parametrize("dim_type,dim_val,name", [
    (4, 65536, "huge"),   # LONG 65536² u16 = 8 GB claimed from a 208 B file
    (3, 65536, "zero"),   # SHORT 65536 truncates to 0 -> a 0x0 page claim
    (4, 0, "explicit0"),  # LONG explicit zero dims
])
def test_absurd_dimension_claim(tmp_path, dim_type, dim_val, name):
    """An IFD claiming huge or zero-size pages must not make the reader
    allocate unbounded memory or return a silent empty array."""
    p = str(tmp_path / f"absurd_{name}.tif")
    with open(p, "wb") as f:
        f.write(_ifd_tiff(dim_type, dim_val))
    _expect_clean(p)
    if native_available():
        try:
            out = read_tiff_stack_native(p)
            # reject (None -> PIL fallback) or a real bounded array; never
            # a silent empty page and never an 8 GB allocation
            assert out is None or (out.size > 0 and out.nbytes < (1 << 30))
        except Exception:
            pass
