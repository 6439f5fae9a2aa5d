"""XLFM dataset loading (host side).

Reference: XLFMDataset.py:57-248 (XLFMDatasetFull), 251-405 (ConcatDataset),
utils.py:128-220 (load_process_volume / load_XLFM_data).

Host I/O feeds device buffers as plain numpy arrays; all device-side work
(view extraction, normalization) happens inside the jitted pipeline.  TIFF
loading order and hygiene match the reference: NaN/Inf clamped to [0, 50000]
(XLFMDataset.py:101-104), images padded-to-square then center-cropped to the
camera frame (XLFMDataset.py:160-162), volumes center depth-windowed
(XLFMDataset.py:153-157) and center-cropped spatially
(utils.py:105-126,167).
"""

from __future__ import annotations

import glob
import re
import os

import numpy as np

from cwfa_tpu.data.stats import (DatasetStatistics, clip_volume_quantile,
                                 threshold_images)
from cwfa_tpu.data.tiff import read_tiff_stack


def read_lenslet_centers(filename: str) -> np.ndarray:
    """Tab-separated x<TAB>y rows (reference utils.py:27-40)."""
    rows = []
    with open(filename) as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                rows.append((int(parts[0]), int(parts[1])))
    return np.array(rows, np.int64)


def _pad_to_square_img(img: np.ndarray) -> np.ndarray:
    """reference pad_img_to_min (XLFMDataset.py:15-25): despite the name,
    the F.pad widths ``(min - dim)//2`` are never positive, so the op
    CROPS the larger dimension symmetrically down to the smaller one
    (an odd difference crops one pixel extra — ``(min-w)//2`` floors
    toward -inf, replayed here)."""
    h, w = img.shape[-2:]
    m = min(h, w)
    ch = -((m - h) // 2)          # per-side crop (>= 0)
    cw = -((m - w) // 2)
    return img[..., ch:h - ch or None, cw:w - cw or None]


def _center_crop_img(img: np.ndarray, target_hw) -> np.ndarray:
    """reference center_crop (XLFMDataset.py:27-40) generalized: the
    reference only slices (inputs are always >= 2160^2); ours also
    zero-pads dimensions SMALLER than the target (tiny synthetic rigs),
    each dimension handled independently so mixed pad/crop shapes work."""
    h, w = img.shape[-2:]
    th, tw = target_hw
    sy, sx = max((h - th) // 2, 0), max((w - tw) // 2, 0)
    ch, cw = min(h, th), min(w, tw)
    if ch == th and cw == tw:
        return img[..., sy:sy + th, sx:sx + tw]
    out = np.zeros(img.shape[:-2] + (th, tw), img.dtype)
    dy, dx = max((th - h) // 2, 0), max((tw - w) // 2, 0)
    out[..., dy:dy + ch, dx:dx + cw] = img[..., sy:sy + ch, sx:sx + cw]
    return out


def _center_crop_vol_spatial(vol: np.ndarray, side_hw) -> np.ndarray:
    """reference crop_volume_center (utils.py:105-126) on (D, H, W): the
    reference's h//2 - th//2 start for the crop case, plus zero-padding
    for dimensions SMALLER than the target (the reference only ever
    crops; a negative slice start here silently returned a corner
    fragment instead)."""
    _, h, w = vol.shape
    th, tw = side_hw
    ch, cw = min(h, th), min(w, tw)
    y0 = min(max(h // 2 - th // 2, 0), h - ch)
    x0 = min(max(w // 2 - tw // 2, 0), w - cw)
    if ch == th and cw == tw:
        return vol[:, y0:y0 + th, x0:x0 + tw]
    out = np.zeros((vol.shape[0], th, tw), vol.dtype)
    dy, dx = max((th - h) // 2, 0), max((tw - w) // 2, 0)
    out[:, dy:dy + ch, dx:dx + cw] = vol[:, y0:y0 + ch, x0:x0 + cw]
    return out


class XLFMDataset:
    """One fish's frames: camera images + (optionally) GT volumes.

    Layout: <data_path>/XLFM_image/XLFM_image_stack.tif (N pages) and
    <data_path>/XLFM_stack/*NNN.tif per-frame depth stacks."""

    def __init__(self, data_path: str, lenslet_coords_path: str, img_shape,
                 n_depths_to_fill: int = 120, images_to_use=None,
                 lenslets_offset: int = 50, load_vols: bool = True,
                 ds_id: str = ""):
        self.data_path = data_path
        self.dataset_id = ds_id
        self.lenslet_coords = (read_lenslet_centers(lenslet_coords_path)
                               + lenslets_offset)
        self.n_lenslets = len(self.lenslet_coords)
        self.img_shape = tuple(img_shape)
        self.load_vols = load_vols
        self.gt_cache: list = []          # mean-volume cache (filled by engine)

        imgs_path = os.path.join(data_path, "XLFM_image",
                                 "XLFM_image_stack.tif")
        if images_to_use is not None:
            # pre-filter out-of-range pages HERE so the image rows and the
            # volume lookup below stay index-aligned — the readers filter
            # internally, and zipping the unfiltered request against the
            # filtered result would pair frame i's image with the wrong
            # volume file
            from cwfa_tpu.data.tiff import count_tiff_pages
            try:
                n_avail = count_tiff_pages(imgs_path)
            except Exception:
                n_avail = None
            if n_avail is not None:
                kept = [p for p in images_to_use if 0 <= p < n_avail]
                if len(kept) != len(images_to_use):
                    dropped = [p for p in images_to_use if p not in kept]
                    print(f"warning: frames {dropped} out of range "
                          f"(stack has {n_avail} pages) — skipped")
                images_to_use = kept
        imgs = read_tiff_stack(imgs_path, pages=images_to_use)
        imgs = np.nan_to_num(imgs)
        imgs = np.clip(imgs, 0, 50000)
        self.n_images = imgs.shape[0]
        if images_to_use is None:
            images_to_use = list(range(self.n_images))
        if len(images_to_use) != self.n_images:
            # reached only when the page count probe failed above AND the
            # reader filtered internally: truncating would re-pair images
            # with the wrong volume files (the exact misalignment the
            # pre-filter exists to prevent) — refuse instead
            raise ValueError(
                f"requested {len(images_to_use)} pages but the reader "
                f"returned {self.n_images}; out-of-range page indices "
                f"could not be pre-filtered (page-count probe failed) — "
                f"fix images_to_use or the image stack")
        self.images_to_use = list(images_to_use)

        self.stacked_views = np.zeros((self.n_images,) + self.img_shape,
                                      np.float32)
        for i in range(self.n_images):
            im = _pad_to_square_img(imgs[i])
            self.stacked_views[i] = _center_crop_img(im, self.img_shape)

        if load_vols:
            vols_glob = os.path.join(data_path, "XLFM_stack", "*.tif")
            files = {}
            for idx_pos, img_ix in enumerate(self.images_to_use):
                match = sorted(glob.glob(os.path.join(
                    data_path, "XLFM_stack", f"*{img_ix:03d}.tif")))
                # the 3-digit-suffix glob (reference XLFMDataset.py layout)
                # would also match e.g. *_1005.tif for frame 5 on >=1001-
                # frame datasets; keep only files whose FULL trailing
                # number equals the frame index
                match = [m for m in match
                         if (lambda g: g and int(g.group(1)) == img_ix)(
                             re.search(r"(\d+)\.tif$", os.path.basename(m)))]
                if not match:
                    raise FileNotFoundError(
                        f"volume for frame {img_ix} not found under {vols_glob}")
                files[idx_pos] = match[0]
            first = read_tiff_stack(files[0])          # (D, H, W)
            d_have = first.shape[0]
            d_use = min(n_depths_to_fill, d_have)
            # float16 volume storage (the reference's dtype,
            # XLFMDataset.py:78 ``.half()``): halves host RAM AND the
            # host->device upload bytes per GT volume (~59 MB vs 118 at
            # flagship); the device normalize upcasts to f32 (weak-typed
            # scalar stats), statistics accumulate in f64 (stats.py), and
            # the clamp ceiling 50000 sits inside f16 range (65504)
            self.vols = np.zeros((self.n_images, d_use) + first.shape[1:],
                                 np.float16)
            for i in range(self.n_images):
                vol = first if i == 0 else read_tiff_stack(files[i])
                # clear NaN as well as Inf: one NaN voxel (a common RL-
                # deconvolution artifact) would poison the dataset-wide
                # mean/std and surface as NaN loss far from the cause
                vol = np.where(np.isfinite(vol), vol, 0)
                lo = vol.shape[0] // 2 - d_use // 2
                self.vols[i] = vol[lo:lo + d_use]
        else:
            self.vols = np.zeros((1,), np.float32)

    def __len__(self):
        return self.n_images

    def __getitem__(self, index):
        views = self.stacked_views[index][None]  # (1, H, W)
        if not self.load_vols:
            return views
        return views, self.vols[index], index, self.gt_cache

    def standardize(self, stats: DatasetStatistics):
        self.stacked_views = (self.stacked_views - stats.mean_imgs) / stats.std_imgs
        self.vols = (self.vols - stats.mean_vols) / stats.std_vols

    # reference leaf API (XLFMDataset.py:169-199) --------------------------
    standarize = standardize            # reference spelling (XLFMDataset.py:186)

    @staticmethod
    def standarize_sample(sample, mean, std):
        """(sample - mean) / std (XLFMDataset.py:192-194)."""
        return (sample - mean) / std

    def get_n_depths(self):
        """Number of depth planes.  The reference returns
        ``vols.shape[1]`` of its (N, H, W, D) layout (XLFMDataset.py:173-174)
        — that is H, an evident bug; ours returns the actual depth count
        of our (N, D, H, W) layout."""
        return int(self.vols.shape[1]) if self.load_vols else 0

    def get_max(self):
        """(max_imgs, max_imgs_sparse, max_vols) (XLFMDataset.py:176-180).
        Without a separate sparse channel the sparse max equals the image
        max, matching the reference's own non-sparse behavior."""
        m = float(self.stacked_views.max())
        return m, m, float(self.vols.max())

    def len_lenslets(self):
        """Total number of lenslets (XLFMDataset.py:195-197)."""
        return self.n_lenslets

    def get_lenslets_coords(self):
        """2-D lenslet coordinates (XLFMDataset.py:198-200)."""
        return self.lenslet_coords

    def add_random_shot_noise_to_dataset(self, signal_power_range=(32 ** 2,
                                                                   32 ** 2),
                                         rng=None):
        """Poisson shot-noise augmentation of the camera frames.

        The reference declares this on ConcatDataset
        (XLFMDataset.py:397-405) as a delegating loop, but the leaf
        method on XLFMDatasetFull is absent — calling it there raises
        AttributeError.  Implemented here per the evident intent (the
        signal_power convention of the SLNet/XLFMNet lineage): per frame,
        draw a signal power uniformly from ``signal_power_range``, scale
        the frame so its mean equals that power, Poisson-sample photon
        counts, and scale back — noise variance tracks the (scaled)
        signal, lower power = noisier.  Frames with non-positive mean
        are left untouched.
        """
        rng = np.random.default_rng(rng)
        lo, hi = float(signal_power_range[0]), float(signal_power_range[-1])
        for i in range(self.n_images):
            frame = self.stacked_views[i]
            mean = float(frame.mean())
            if mean <= 0:
                continue
            power = rng.uniform(lo, hi) if hi > lo else lo
            scaled = np.clip(frame, 0, None) * (power / mean)
            noisy = rng.poisson(scaled).astype(self.stacked_views.dtype)
            self.stacked_views[i] = noisy * (mean / power)


class ConcatXLFMDataset:
    """Multi-fish concatenation with global statistics
    (reference ConcatDataset, XLFMDataset.py:251-405)."""

    def __init__(self, *datasets: XLFMDataset):
        self.datasets = list(datasets)
        self.max_values = None          # get_max cache (XLFMDataset.py:263)

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, index):
        # normalize negative indices GLOBALLY first: a raw negative index
        # would fall through to the FIRST dataset's numpy indexing and
        # silently return the wrong fish's frame
        if index < 0:
            index += len(self)
        if index < 0:
            raise IndexError(index)
        for d in self.datasets:
            if index < len(d):
                return d[index]
            index -= len(d)
        raise IndexError

    def locate(self, index):
        """(dataset_index, local_index) for a global index."""
        if index < 0:
            index += len(self)
        if index < 0:
            raise IndexError(index)
        for di, d in enumerate(self.datasets):
            if index < len(d):
                return di, index
            index -= len(d)
        raise IndexError

    def get_statistics(self) -> DatasetStatistics:
        """Global mean/std (ddof=1) over all fish, streamed per dataset —
        concatenating every pixel first would transiently double the
        whole-dataset memory (multiple GB at flagship) for two scalars."""
        def moments(arrs):
            n = s = s2 = 0.0
            for a in arrs:
                a = a.astype(np.float64, copy=False)
                n += a.size
                s += float(a.sum())
                s2 += float(np.square(a).sum())
            mean = s / n
            var = max(s2 - n * mean * mean, 0.0) / (n - 1)   # ddof=1
            return mean, float(np.sqrt(var))
        mi, si = moments(d.stacked_views for d in self.datasets)
        mv, sv = moments(d.vols for d in self.datasets)
        return DatasetStatistics(mean_imgs=mi, std_imgs=si,
                                 mean_imgs_s=mi, std_imgs_s=si,
                                 mean_vols=mv, std_vols=sv)

    def mean_volume(self, dataset_ix: int) -> np.ndarray:
        """Per-fish mean of the GT volumes (CWFA.py:645).  f32 accumulation
        regardless of the f16 storage dtype (numpy would otherwise
        accumulate a float16 mean in float16)."""
        return self.datasets[dataset_ix].vols.astype(np.float32).mean(
            0, keepdims=True)

    def add_random_shot_noise_to_dataset(self, signal_power_range=(32 ** 2,
                                                                   32 ** 2),
                                         rng=None):
        """Delegating loop (reference XLFMDataset.py:397-405)."""
        rng = np.random.default_rng(rng)
        for d in self.datasets:
            d.add_random_shot_noise_to_dataset(signal_power_range, rng=rng)

    # reference ConcatDataset API (XLFMDataset.py:269-395) -----------------
    def getSamplePath(self, index):
        """Path of the dataset owning a global sample index
        (XLFMDataset.py:269-284)."""
        di, _ = self.locate(index)
        return self.datasets[di].data_path

    def mean(self, axis=0):
        """Per-fish mean of the GT volumes, stacked on a leading fish axis
        (XLFMDataset.py:304-313; the reference permutes its (H, W, D, F)
        concat to fish-major — ours is fish-major by construction,
        (F, D, H, W) in our volume layout)."""
        return np.stack([d.vols.astype(np.float32).mean(axis)
                         for d in self.datasets])

    def std(self, axis=0):
        """Per-fish std of the GT volumes (XLFMDataset.py:293-302;
        torch's unbiased ddof=1 estimator)."""
        return np.stack([d.vols.astype(np.float32).std(axis, ddof=1)
                         for d in self.datasets])

    def get_max(self):
        """Global (max_imgs, max_imgs_sparse, max_vols) across all fish,
        cached (XLFMDataset.py:341-360).  No sparse channel in our layout,
        so the sparse max equals the image max (the reference's own
        non-sparse branch does the same)."""
        if self.max_values is None:
            maxes = [d.get_max() for d in self.datasets]
            self.max_values = [max(m[0] for m in maxes),
                               max(m[1] for m in maxes),
                               max(m[2] for m in maxes)]
        return self.max_values

    def normalize_datasets(self):
        """Rescale every fish to the global max (XLFMDataset.py:362-382):
        each dataset's views/volumes are divided by their OWN max and
        multiplied by the global max, equalizing peak intensity across
        fish."""
        mx = self.get_max()
        for d in self.datasets:
            # zero guards (like apply_volume_norm's): an all-zero stack or
            # a views-only dataset (load_vols=False keeps a zeros dummy)
            # must not 0/0 into NaNs
            d.stacked_views = (d.stacked_views
                               / (float(d.stacked_views.max()) or 1.0)
                               * mx[0]).astype(d.stacked_views.dtype)
            d.vols = (d.vols / (float(d.vols.max()) or 1.0) * mx[2]
                      ).astype(d.vols.dtype)

    def standarize_datasets(self, stats: DatasetStatistics | None = None):
        """Standardize every fish with shared statistics
        (XLFMDataset.py:384-395); computes them when not given."""
        if stats is None:
            stats = self.get_statistics()
        for d in self.datasets:
            d.standardize(stats)
        return stats


def apply_volume_norm(vols: np.ndarray, norm, volume_ths) -> np.ndarray:
    """The reference's volume normalization family
    (``--volume_norm_func`` -> utils.py:128-184 load_process_volume):

    - norm='std': standardize the whole volume stack by its own mean/std
      (torch.std_mean uses the unbiased estimator);
    - norm='max': divide by the stack max, then zero voxels below the
      threshold.  The reference compares against ``volume_ths`` directly
      (utils.py:174-175) which only works for a scalar; for the default
      2-tuple the lower bound is used (documented generalization);
    - norm=None: two-sided absolute thresholding (the default path,
      utils.py:177-182).
    """
    if norm == "std":
        mean = float(vols.mean())
        std = float(vols.std(ddof=1)) or 1.0
        return (vols - mean) / std
    if norm == "max":
        mx = float(vols.max()) or 1.0
        out = vols / mx
        ths = (float(volume_ths[0]) if hasattr(volume_ths, "__len__")
               else float(volume_ths))
        out[out < ths] = 0
        return out
    if norm is not None:
        raise ValueError(f"unknown volume_norm_func {norm!r} "
                         "(expected None, 'std' or 'max')")
    if hasattr(volume_ths, "__len__") and len(volume_ths) == 2:
        vols[vols < volume_ths[0]] = 0
        vols[vols >= volume_ths[1]] = volume_ths[1]
    elif not hasattr(volume_ths, "__len__"):
        # scalar form: zero below ths*max (utils.py:178-179)
        vols[vols <= float(volume_ths) * vols.max()] = 0
    return vols


def load_xlfm_data(dataset_path, lenslet_coords_file, vol_shape, img_shape,
                   images_to_use, n_depths_to_fill, ds_id="",
                   volume_ths=(0.0, 20000), volume_quantiles=(0, 0.99999),
                   img_ths=(0.01, 1), norm=None) -> XLFMDataset:
    """Dataset + hygiene thresholds (reference load_XLFM_data,
    utils.py:187-220): spatial center-crop volumes to vol_shape, two-sided
    volume thresholding, histogram-quantile clipping, image low-threshold
    zeroing."""
    ds = XLFMDataset(dataset_path, lenslet_coords_file, img_shape=img_shape,
                     images_to_use=images_to_use,
                     n_depths_to_fill=n_depths_to_fill, ds_id=ds_id)
    side = (vol_shape[0], vol_shape[1])
    if ds.vols.ndim == 4 and ds.vols.shape[-2:] != side:
        ds.vols = np.stack([_center_crop_vol_spatial(v, side) for v in ds.vols])
    ds.vols = apply_volume_norm(ds.vols, norm, volume_ths)
    if volume_quantiles[1] != 1:
        ds.vols = clip_volume_quantile(ds.vols, volume_quantiles[1])
    ds.stacked_views = threshold_images(ds.stacked_views, img_ths[0])
    return ds
