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

    One fused gather over flattened (H*W) indices — a two-stage row/col
    gather would materialize a (B, n, vh, W) intermediate (~1 GB at batch 8
    on the 2160^2 camera frames)."""
    if image.ndim == 4:
        image = image[:, 0]
    rows = jnp.asarray(indices["rows"])        # (n, vh)
    cols = jnp.asarray(indices["cols"])        # (n, vw)
    rmask = jnp.asarray(indices["row_mask"], image.dtype)
    cmask = jnp.asarray(indices["col_mask"], image.dtype)
    w = image.shape[-1]
    flat_ix = rows[:, :, None].astype(jnp.int32) * w \
        + cols[:, None, :].astype(jnp.int32)   # (n, vh, vw)
    g = jnp.take(image.reshape(image.shape[0], -1),
                 flat_ix.reshape(-1), axis=1)
    g = g.reshape(image.shape[0], *flat_ix.shape)
    return g * rmask[None, :, :, None] * cmask[None, :, None, :]
