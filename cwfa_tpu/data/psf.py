"""PSF loading and OTF precomputation.

Reference: utils.py:553-627 (load_PSF / load_PSF_OTF): load a (D, P, P') PSF
stack from .mat / .h5 / .tif, square-pad, subsample depths (interleaved
linspace), normalize each depth plane to unit sum, then precompute the rFFT
OTF (+ conjugate pair) at fullSize = vol + psf.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cwfa_tpu.data.tiff import read_tiff_stack
from cwfa_tpu.ops.fft_conv import precompute_otf


def _pad_to_square(psf: np.ndarray) -> np.ndarray:
    """reference pad_img_to_min applied to the PSF (utils.py:574): crops
    the larger trailing dim symmetrically down to the smaller one — same
    semantics (incl. the odd-difference extra pixel) as the camera-frame
    path.  The old two-stage crop-then-pad here raised on odd-difference
    PSFs (negative np.pad widths)."""
    from cwfa_tpu.data.dataset import _pad_to_square_img
    return _pad_to_square_img(psf)


def load_psf(source, depths_to_use=-1, interleaved: bool = True) -> np.ndarray:
    """Load a PSF as (1, D, P, P), depth-subsampled and per-depth
    sum-normalized (utils.py:553-591).

    source: path to .tif/.mat/.h5 or an (D, H, W)/(1, D, H, W) array.
    depths_to_use: -1 = all; int n = n interleaved (or centered) depths;
      or an explicit index list.
    """
    if isinstance(source, str):
        if source.endswith((".mat",)):
            try:
                from scipy.io import loadmat
                psf = np.transpose(loadmat(source)["PSF"], (2, 0, 1))
            except (NotImplementedError, ValueError):
                # MATLAB v7.3 .mat files are HDF5 (reference utils.py:564-568
                # falls back the same way). MATLAB stores arrays
                # column-major, so an (H, W, D) MATLAB array reads back as
                # (D, W, H) — undo that to match the loadmat path's
                # (D, H, W). (The reference uses the h5py array as-is,
                # silently transposing every depth plane of a v7.3 PSF —
                # see docs/PARITY.md.)
                import h5py
                with h5py.File(source, "r") as f:
                    psf = np.asarray(f["PSF"][:], np.float32)
                psf = np.transpose(psf, (0, 2, 1))
        elif source.endswith((".h5", ".hdf5")):
            # plain HDF5 written row-major (Python convention): (D, H, W)
            # as-is, like the reference's utils.py:566-568 fallback
            import h5py
            with h5py.File(source, "r") as f:
                psf = np.asarray(f["PSF"][:], np.float32)
        else:
            psf = read_tiff_stack(source)
    else:
        psf = np.asarray(source, np.float32)
    if psf.ndim == 4:
        psf = psf[0]
    psf = _pad_to_square(psf)[None]  # (1, D, P, P)

    if isinstance(depths_to_use, int):
        if depths_to_use == -1:
            depths = list(range(psf.shape[1]))
        else:
            n = depths_to_use
            if interleaved:
                depths = np.linspace(0, psf.shape[1], n + 2).astype(np.int64)[1:-1]
            else:
                # the reference's exact window (utils.py:585): note the +1
                # shift off center, and that n >= D-1 indexes out of bounds
                # — both replayed (the reference IndexErrors there too)
                c = psf.shape[1] // 2
                depths = list(range(c - n // 2 + 1, c - n // 2 + 1 + n))
    else:
        depths = list(depths_to_use)
    psf = psf[:, depths]
    sums = psf.sum(axis=(-2, -1), keepdims=True)
    sums[sums == 0] = 1.0
    return (psf / sums).astype(np.float32)


def load_psf_otf(source, vol_size, device_put: bool = True):
    """PSF -> device OTF (reference load_PSF_OTF, utils.py:593-627).

    vol_size: (S, S, D) in the reference's (x, y, depths) order.
    Returns (otf, psf_hw, full_hw); otf is complex64 (1, D, F0, F1r) on
    backends with FFT/complex support, else a SpecPair (re, im) f32 pair
    (ops.fft_conv.backend_has_fft).
    """
    n_depths = vol_size[-1]
    psf = load_psf(source, n_depths)
    psf_hw = psf.shape[-2:]
    otf, full_hw = precompute_otf(jnp.asarray(psf), tuple(vol_size[:2]))
    return otf, psf_hw, full_hw
