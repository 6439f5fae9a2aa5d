"""PSF loading across all reference-supported formats (utils.py:553-591):
.tif, .mat (old-style scipy), .mat v7.3 (= HDF5), and .h5."""

import numpy as np
import pytest

from cwfa_tpu.data.psf import load_psf, load_psf_otf
from cwfa_tpu.data.tiff import write_tiff_stack


@pytest.fixture(scope="module")
def psf_np():
    rng = np.random.RandomState(7)
    return np.abs(rng.rand(10, 24, 24)).astype(np.float32)


def _check(psf, d=10):
    assert psf.shape == (1, d, 24, 24)
    np.testing.assert_allclose(psf.sum(axis=(-2, -1)), 1.0, rtol=1e-5)


def test_load_psf_tif(psf_np, tmp_path):
    p = str(tmp_path / "psf.tif")
    write_tiff_stack(p, psf_np)
    _check(load_psf(p))


def test_load_psf_mat_oldstyle(psf_np, tmp_path):
    from scipy.io import savemat
    p = str(tmp_path / "psf.mat")
    # reference layout: PSF stored (H, W, D), transposed on load
    savemat(p, {"PSF": np.transpose(psf_np, (1, 2, 0))})
    _check(load_psf(p))


def test_load_psf_h5(psf_np, tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "psf.h5")
    with h5py.File(p, "w") as f:
        f["PSF"] = psf_np
    _check(load_psf(p))


def test_load_psf_mat_v73(psf_np, tmp_path):
    """MATLAB v7.3 .mat files are HDF5; scipy raises NotImplementedError and
    the loader falls back to h5py (reference utils.py:564-568).  MATLAB
    stores (H, W, D) column-major, so h5py reads (D, W, H); the loader must
    reorient to the loadmat path's (D, H, W) — write the dataset the way
    MATLAB would and check plane-level equality against the array."""
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "psf_v73.mat")
    # make H/W distinguishable per depth plane
    asym = psf_np.copy()
    asym[:, 0, :] *= 3.0
    with h5py.File(p, "w", userblock_size=512) as f:
        # MATLAB's column-major (H, W, D) appears to h5py as (D, W, H)
        f["PSF"] = np.transpose(asym, (0, 2, 1))
    # stamp the MATLAB 7.3 userblock header so scipy detects-and-rejects it:
    # 116 bytes description + 8 bytes subsys offset + version 0x0200 + 'IM'
    with open(p, "r+b") as f:
        f.write(b"MATLAB 7.3 MAT-file" + b" " * 97 + b"\x00" * 8
                + b"\x00\x02IM")
    got = load_psf(p)
    _check(got)
    want = asym / asym.sum(axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(got[0], want, rtol=1e-5)


def test_load_psf_depth_subsample(psf_np, tmp_path):
    p = str(tmp_path / "psf.tif")
    write_tiff_stack(p, psf_np)
    psf = load_psf(p, depths_to_use=4)
    _check(psf, d=4)
    # interleaved linspace picks (utils.py:576)
    expect = np.linspace(0, 10, 6).astype(np.int64)[1:-1]
    direct = psf_np[list(expect)]
    direct = direct / direct.sum(axis=(-2, -1), keepdims=True)
    np.testing.assert_allclose(psf[0], direct, rtol=1e-5)


def test_load_psf_otf_h5(psf_np, tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "psf.h5")
    with h5py.File(p, "w") as f:
        f["PSF"] = psf_np
    otf, psf_hw, full_hw = load_psf_otf(p, (32, 32, 10))
    # 32+24 = 56 = 2^3*7 rounds up to the 5-smooth 60 (TPU FFT fast path)
    assert otf.shape == (1, 10, 60, 31)
    assert full_hw == (60, 60)
