"""Evaluation metrics: per-step PSNR/MAPE and neural-activity correlation.

Reference: CWFA.py:98-132 (compute_INN_step_performance), 240-379
(corr_coeff_3D), utils.py:419-446 (trace filtering/normalization).
These run host-side on numpy (they are not in the jit path in the reference
either — everything goes through .cpu() there).
"""

from __future__ import annotations

import numpy as np


def _psnr_np(a, b, pixel_max=1.0):
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return 0.0 if a.sum() == 0 else 100.0
    return 20.0 * np.log10(pixel_max / np.sqrt(mse))


def compute_step_performance(gt_volume, pred_volume, step, mean, std,
                             ths: float = 0.05):
    """Un-normalize by /2^step then *std - mean (the reference's exact
    un-normalization, CWFA.py:110-117 — note the minus), then PSNR and the
    masked-MAE 'MAPE' (CWFA.py:124-128)."""
    gt_raw = np.asarray(gt_volume, np.float64) / (2 ** step) * std - mean
    pred_raw = np.asarray(pred_volume, np.float64) / (2 ** step) * std - mean
    p = pred_raw.copy()
    if ths != 0:
        p[p < np.abs(p).max() * ths] = 0
        masked = float(np.mean(np.abs(gt_raw - p))) * 100.0
    else:
        masked = 0.0
    return _psnr_np(gt_raw, pred_raw), masked, gt_raw, pred_raw


def read_neural_coordinates(filename) -> list:
    """Load (x, y, z) neuron coordinates from the per-fish CSV, keeping rows
    with is_gt == 1 (reference read_neural_coordinates_from_file,
    CWFA.py:223-238)."""
    import csv
    coords = []
    files = [filename] if isinstance(filename, str) else list(filename)
    for fn in files:
        with open(fn) as f:
            for row in csv.DictReader(f):
                try:
                    if int(float(row.get("is_gt", 0))) == 1:
                        coords.append([float(row["coord_x"]),
                                       float(row["coord_y"]),
                                       float(row["coord_z"])])
                except (KeyError, ValueError):
                    continue
    return coords


def filter_trace(data, kernel_size: int = 10):
    """Moving-average filter (reference filter_data, utils.py:419-427)."""
    if kernel_size == 0:
        return np.asarray(data, np.float64)
    kernel = np.ones(kernel_size) / kernel_size
    return np.convolve(np.asarray(data, np.float64), kernel, mode="same")


def norm_trace(data, filter_width: int = 10):
    """Normalize a temporal trace to [0,1]; returns (trace, minmax range)
    (reference norm_data, utils.py:429-446)."""
    d = filter_trace(data, filter_width)
    lo, hi = d.min(), d.max()
    rng = hi - lo
    denom = hi if hi != 0 else 1.0
    return (d - lo) / denom, rng


def corr_coeff_3d(stack_gt, pred_3d, coords, r12: int = 5, r3: int = 3,
                  start_plane_offset: int = -12, minmax_ths: float = 50.0,
                  filter_width: int = 10):
    """Pearson correlation of GT-vs-predicted temporal traces in ROI patches
    around neuron coordinates, with the reference's adaptive threshold
    halving (CWFA.py:276-335).

    stack_gt/pred_3d: (T, D, H, W); coords: list of (x, y, z).
    Returns (corr_coeffs list, records list of dicts).
    """
    stack_gt = np.asarray(stack_gt, np.float64)
    pred_3d = np.asarray(pred_3d, np.float64)
    stack_gt = stack_gt / max(stack_gt.max(), 1e-12)
    pred_3d = pred_3d / max(pred_3d.max(), 1e-12)

    all_cc: list = []
    records: list = []
    required = int(len(coords) * 0.2)
    n_div = 0
    while len(all_cc) <= required and n_div < 5:
        nz = stack_gt[stack_gt > 0]
        img_ths = (np.median(nz) if nz.size else 0.0) * minmax_ths
        for ix, (x, y, z) in enumerate(coords):
            zc = int(z) + stack_gt.shape[1] // 2 + start_plane_offset
            xs = slice(max(0, int(x) - r12), min(stack_gt.shape[3], int(x) + r12))
            ys = slice(max(0, int(y) - r12), min(stack_gt.shape[2], int(y) + r12))
            zs = slice(max(0, zc - r3), min(stack_gt.shape[1], zc + r3))
            gt_roi = stack_gt[:, zs, ys, xs]
            if gt_roi.size == 0:
                all_cc.append(0.0)
                continue
            fw = min(filter_width, gt_roi.shape[0])
            gt_sig, rng = norm_trace(gt_roi.mean(axis=(1, 2, 3)), fw)
            if rng < img_ths:
                continue
            pr_sig, _ = norm_trace(pred_3d[:, zs, ys, xs].mean(axis=(1, 2, 3)), fw)
            if gt_sig.max() == 0 or pr_sig.max() == 0:
                cc = 0.0
            elif np.std(gt_sig) == 0 or np.std(pr_sig) == 0:
                cc = 0.0
            else:
                cc = float(np.corrcoef(gt_sig, pr_sig)[0, 1])
            all_cc.append(cc)
            for is_gt, sig in ((1, gt_sig), (0, pr_sig)):
                rec = {"patch_n": ix, "coord_x": x, "coord_y": y,
                       "coord_z": zc, "corr_coeff": cc, "is_gt": is_gt}
                rec.update({f"t{t}": float(sig[t]) for t in range(len(sig))})
                records.append(rec)
        if len(all_cc) <= required:
            minmax_ths /= 2
            n_div += 1
    return all_cc, records
