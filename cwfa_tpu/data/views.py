"""Lenslet view extraction — the condition builder.

Reference: XLFMDataset.py:212-242 (extract_views): crop 29 lenslet-centered
512x512 patches out of the 2160x2160 camera image into (B, 29, 512, 512).
The reference runs a 29-iteration Python loop with edge clamping and
bottom-right patch alignment; here the crops become two batched gathers with
host-precomputed index/mask tables — one jittable op, vmapped over nothing.

Edge semantics reproduced exactly: window rows are
``[max(c-half, 0), c+half)`` (python slicing truncates past the image), the
(possibly shorter) patch is written at the END of the 512-window
(``stacked_views[..., -h:, -w:] = patch``), leaving zeros at the start.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_view_indices(lenslet_coords: np.ndarray, img_hw, view_hw):
    """Precompute gather rows/cols + validity masks.

    lenslet_coords: (n_lenslets, 2) int array of (row, col) centers, already
      including the +50 offset the dataset applies (XLFMDataset.py:74).
    Returns dict of numpy arrays: rows/cols (n, view) int32, row_mask/col_mask
      (n, view) float32.
    """
    coords = np.asarray(lenslet_coords, np.int64)
    n = coords.shape[0]
    out = {}
    for axis, (size, vsize) in enumerate(zip(img_hw, view_hw)):
        half = vsize // 2
        idx = np.zeros((n, vsize), np.int32)
        mask = np.zeros((n, vsize), np.float32)
        for l in range(n):
            c = int(coords[l, axis])
            lo = max(c - half, 0)
            hi = min(c + half, size)
            h = max(hi - lo, 0)
            r = np.arange(vsize)
            src = hi - vsize + r          # out slot r <- img index hi-vsize+r
            valid = (r >= vsize - h) & (src >= 0) & (src < size)
            idx[l] = np.clip(src, 0, size - 1)
            mask[l] = valid.astype(np.float32)
        out["rows" if axis == 0 else "cols"] = idx
        out["row_mask" if axis == 0 else "col_mask"] = mask
    return out


def extract_views(image: jax.Array, indices: dict) -> jax.Array:
    """image: (B, H, W) or (B, 1, H, W) -> views (B, n_lenslets, vh, vw).

    The row/col index tables are contiguous ranges by construction (clipped
    crop windows), so each view is a STATIC slice — XLA lowers these to plain
    copies, far faster than a gather at these sizes. Masks zero the
    off-image region, matching the reference's end-aligned placement."""
    if image.ndim == 4:
        image = image[:, 0]
    rows = np.asarray(indices["rows"])         # (n, vh) host tables
    cols = np.asarray(indices["cols"])
    rmask = np.asarray(indices["row_mask"])
    cmask = np.asarray(indices["col_mask"])
    vh, vw = rows.shape[1], cols.shape[1]
    views = []
    for l in range(rows.shape[0]):
        rvalid = np.nonzero(rmask[l])[0]
        cvalid = np.nonzero(cmask[l])[0]
        if len(rvalid) == 0 or len(cvalid) == 0:
            views.append(jnp.zeros(image.shape[:1] + (vh, vw), image.dtype))
            continue
        r_lo, r_hi = int(rows[l, rvalid[0]]), int(rows[l, rvalid[-1]]) + 1
        c_lo, c_hi = int(cols[l, cvalid[0]]), int(cols[l, cvalid[-1]]) + 1
        v = jax.lax.slice(image, (0, r_lo, c_lo),
                          (image.shape[0], r_hi, c_hi))
        # end-aligned placement: zeros fill the leading (clipped) region
        v = jnp.pad(v, ((0, 0),
                        (vh - (r_hi - r_lo), 0),
                        (vw - (c_hi - c_lo), 0)))
        views.append(v)
    # Build (B, n, vh, vw) WITHOUT a per-lenslet stack: stacking (B, vh, vw)
    # slices on a new size-1 axis made XLA materialize ~20 separate
    # f32[B,1,vh,vw] temps laid out {1,0,3,2:T(8,128)} — the size-1 axis
    # padded 128x (1 GB each at B=8; see BENCH_r01). Concatenating along the
    # row axis keeps every operand free of size-1 dims and the final reshape
    # (B, n*vh, vw) -> (B, n, vh, vw) is a layout-preserving bitcast.
    b = image.shape[0]
    return jnp.concatenate(views, axis=1).reshape(b, len(views), vh, vw)
