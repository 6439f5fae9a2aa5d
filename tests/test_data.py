"""Data-layer tests: view extraction oracle, TIFF roundtrip, synthetic
dataset generation + loading, statistics."""

import numpy as np
import jax.numpy as jnp

from cwfa_tpu.data import (
    make_view_indices, extract_views, read_tiff_stack,
    make_synthetic_dataset, XLFMDataset, ConcatXLFMDataset, load_xlfm_data,
)
from cwfa_tpu.data.tiff import write_tiff_stack
from cwfa_tpu.data.stats import fast_quantile


def _reference_extract_views_oracle(image, coords, view_hw):
    """Literal re-derivation of XLFMDataset.extract_views semantics
    (XLFMDataset.py:224-242) in numpy, as the test oracle."""
    b = image.shape[0]
    n = len(coords)
    half = [view_hw[0] // 2, view_hw[1] // 2]
    out = np.zeros((b, n, view_hw[0], view_hw[1]), image.dtype)
    for l in range(n):
        c = coords[l]
        lo = [max(int(c[k]) - half[k], 0) for k in range(2)]
        patch = image[:, lo[0]:int(c[0]) + half[0], lo[1]:int(c[1]) + half[1]]
        out[:, l, -patch.shape[1]:, -patch.shape[2]:] = patch
    return out


def test_extract_views_matches_oracle():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 100, 100).astype(np.float32)
    # interior, corner-clipped, and edge-clipped lenslets
    coords = np.array([[50, 50], [10, 50], [50, 95], [5, 5], [95, 95]])
    idx = make_view_indices(coords, (100, 100), (32, 32))
    got = np.asarray(extract_views(jnp.asarray(img), idx))
    want = _reference_extract_views_oracle(img, coords, (32, 32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tiff_roundtrip(tmp_path):
    arr = np.random.RandomState(1).rand(5, 16, 24).astype(np.float32)
    p = str(tmp_path / "x.tif")
    write_tiff_stack(p, arr)
    back = read_tiff_stack(p)
    np.testing.assert_allclose(back, arr, atol=1e-6)
    sel = read_tiff_stack(p, pages=[1, 3])
    np.testing.assert_allclose(sel, arr[[1, 3]], atol=1e-6)


def test_fast_quantile():
    x = np.linspace(0, 1, 100000).astype(np.float32)
    q = fast_quantile(x, 0.95)
    assert 0.94 < q < 0.96


def test_synthetic_dataset_roundtrip(tmp_path):
    info = make_synthetic_dataset(str(tmp_path), n_fish=1, n_frames=3,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    ds = load_xlfm_data(fish, info["lenslet_file"],
                        vol_shape=(32, 32, 8), img_shape=(96, 96),
                        images_to_use=[0, 1, 2], n_depths_to_fill=8)
    assert len(ds) == 3
    assert ds.vols.shape == (3, 8, 32, 32)
    assert ds.stacked_views.shape == (3, 96, 96)
    assert ds.vols.max() > 0 and ds.stacked_views.max() > 0

    cat = ConcatXLFMDataset(ds)
    stats = cat.get_statistics()
    assert stats.std_vols > 0 and stats.std_imgs > 0

    views, vol, ix, cache = ds[1]
    assert views.shape == (1, 96, 96) and vol.shape == (8, 32, 32)

    # view extraction runs on the loaded images
    idx = make_view_indices(ds.lenslet_coords, (96, 96), (32, 32))
    v = extract_views(jnp.asarray(ds.stacked_views), idx)
    assert v.shape == (3, 4, 32, 32)
    assert float(jnp.max(v)) > 0


def test_shot_noise_augmentation(tmp_path):
    """add_random_shot_noise_to_dataset: the reference declares the
    ConcatDataset delegator (XLFMDataset.py:397-405) but the leaf method
    is absent there; ours implements the evident intent.  Checks: mean is
    approximately preserved, noise is actually added, variance scales
    with 1/signal_power, and the delegator hits every child."""
    info = make_synthetic_dataset(str(tmp_path), n_fish=1, n_frames=2,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"

    def fresh():
        return load_xlfm_data(fish, info["lenslet_file"],
                              vol_shape=(32, 32, 8), img_shape=(96, 96),
                              images_to_use=[0, 1], n_depths_to_fill=8)

    ds = fresh()
    clean = ds.stacked_views.copy()
    ds.add_random_shot_noise_to_dataset((32 ** 2, 32 ** 2), rng=0)
    noisy = ds.stacked_views
    assert not np.allclose(noisy, clean)
    # scaling preserves the mean in expectation (Poisson mean = rate)
    assert abs(noisy.mean() - clean.mean()) / max(clean.mean(), 1e-9) < 0.05

    # lower signal power -> relatively noisier
    lo_ds, hi_ds = fresh(), fresh()
    lo_ds.add_random_shot_noise_to_dataset((4 ** 2, 4 ** 2), rng=1)
    hi_ds.add_random_shot_noise_to_dataset((64 ** 2, 64 ** 2), rng=1)
    lo_err = np.abs(lo_ds.stacked_views - clean).mean()
    hi_err = np.abs(hi_ds.stacked_views - clean).mean()
    assert lo_err > hi_err

    # delegator touches every child dataset
    a, b = fresh(), fresh()
    cat = ConcatXLFMDataset(a, b)
    before = [a.stacked_views.copy(), b.stacked_views.copy()]
    cat.add_random_shot_noise_to_dataset((32 ** 2, 32 ** 2), rng=2)
    assert not np.allclose(a.stacked_views, before[0])
    assert not np.allclose(b.stacked_views, before[1])


def test_concat_dataset_reference_api(tmp_path):
    """The reference ConcatDataset surface: getSamplePath, mean/std,
    get_max caching, normalize_datasets (global-max equalization),
    standarize_datasets (XLFMDataset.py:269-395)."""
    info = make_synthetic_dataset(str(tmp_path), n_fish=2, n_frames=2,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)

    def load(i):
        return load_xlfm_data(info["fish_dirs"][i] + "/SLNet_preprocessed",
                              info["lenslet_file"], vol_shape=(32, 32, 8),
                              img_shape=(96, 96), images_to_use=[0, 1],
                              n_depths_to_fill=8)

    a, b = load(0), load(1)
    # volumes stored fp16 (the reference's dtype, XLFMDataset.py:78) —
    # halves host RAM and the per-volume h2d upload
    assert a.vols.dtype == np.float16
    # make the two fish clearly different in scale
    b.stacked_views *= 2.0
    b.vols *= 3.0
    cat = ConcatXLFMDataset(a, b)

    # leaf accessors
    assert a.get_n_depths() == 8
    assert a.len_lenslets() == 4
    assert a.get_lenslets_coords().shape == (4, 2)
    np.testing.assert_allclose(
        a.standarize_sample(np.array([3.0]), 1.0, 2.0), [1.0])

    # getSamplePath resolves the owning fish for a global index
    assert cat.getSamplePath(0) == a.data_path
    assert cat.getSamplePath(len(a)) == b.data_path

    # per-fish mean/std volumes, fish-major
    m = cat.mean()
    s = cat.std()
    assert m.shape == (2, 8, 32, 32) and s.shape == m.shape
    # f32 oracle accumulation (vols are STORED f16 — the reference's dtype;
    # a plain f16 .mean() would quantize the oracle itself)
    np.testing.assert_allclose(m[1], b.vols.astype(np.float32).mean(0),
                               rtol=1e-6)
    np.testing.assert_allclose(s[0],
                               a.vols.astype(np.float32).std(0, ddof=1),
                               rtol=1e-5)

    # get_max: global maxes, cached
    mx = cat.get_max()
    assert mx[0] == max(a.stacked_views.max(), b.stacked_views.max())
    assert mx[1] == mx[0]  # no sparse channel
    assert mx[2] == max(a.vols.max(), b.vols.max())
    assert cat.get_max() is mx

    # normalize_datasets equalizes per-fish peaks to the global max
    cat.normalize_datasets()
    for d in (a, b):
        np.testing.assert_allclose(d.stacked_views.max(), mx[0], rtol=1e-5)
        np.testing.assert_allclose(d.vols.max(), mx[2], rtol=1e-5)

    # standarize_datasets: shared stats -> pooled data ~N(0, 1)
    stats = cat.standarize_datasets()
    pooled = np.concatenate([a.vols.ravel(), b.vols.ravel()])
    assert abs(pooled.mean()) < 1e-3
    assert abs(pooled.std(ddof=1) - 1.0) < 1e-3
    assert stats.std_vols > 0


def test_pad_crop_reference_parity():
    """pad_img_to_min is a CROP to the min dim (its F.pad widths are never
    positive; odd differences floor-crop one extra pixel) and center_crop
    must handle mixed pad/crop shapes — regressions: the old square-pad
    was a no-op for rectangles and mixed shapes crashed."""
    from cwfa_tpu.data.dataset import _pad_to_square_img, _center_crop_img
    from cwfa_tpu.data.psf import _pad_to_square

    for shape, want in [((5, 4), (3, 4)), ((7, 4), (3, 4)),
                        ((4, 7), (4, 3)), ((1800, 2400), (1800, 1800)),
                        ((10, 10), (10, 10))]:
        x = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
        got = _pad_to_square_img(x)
        assert got.shape == want
        if shape == (1800, 2400):      # centered: symmetric crop
            np.testing.assert_array_equal(got, x[:, 300:2100])

    # mixed pad/crop: one dim smaller than target, one larger (crashed)
    y = _center_crop_img(np.ones((1800, 2400), np.float32), (2160, 2160))
    assert y.shape == (2160, 2160)
    assert y.sum() == 1800 * 2160      # crop to 2160 wide, pad to 2160 tall

    # crop path: same offsets as the reference center_crop slicing
    x = np.random.RandomState(0).rand(50, 61).astype(np.float32)
    got = _center_crop_img(x, (30, 31))
    np.testing.assert_array_equal(got, x[10:40, 15:46])

    # odd-difference PSFs no longer raise (negative np.pad widths)
    assert _pad_to_square(np.ones((3, 5, 4), np.float32)).shape == (3, 3, 4)


def _two_fish(tmp_path):
    info = make_synthetic_dataset(str(tmp_path), n_fish=2, n_frames=2,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)
    dss = [load_xlfm_data(fd + "/SLNet_preprocessed", info["lenslet_file"],
                          vol_shape=(32, 32, 8), img_shape=(96, 96),
                          images_to_use=[0, 1], n_depths_to_fill=8)
           for fd in info["fish_dirs"]]
    return info, dss


def test_streaming_statistics_match_concatenated(tmp_path):
    """get_statistics streams per-dataset moments; must equal the
    concatenate-everything form exactly (ddof=1)."""
    from cwfa_tpu.data.stats import DatasetStatistics
    info, dss = _two_fish(tmp_path)
    cat = ConcatXLFMDataset(*dss)
    got = cat.get_statistics()
    imgs = np.concatenate([d.stacked_views.reshape(-1)
                           for d in cat.datasets])
    vols = np.concatenate([d.vols.reshape(-1) for d in cat.datasets])
    want = DatasetStatistics.compute(imgs, vols)
    # rtol covers f32 (compute) vs f64 (streaming) accumulation only
    for f in ("mean_imgs", "std_imgs", "mean_vols", "std_vols"):
        np.testing.assert_allclose(getattr(got, f), getattr(want, f),
                                   rtol=1e-6)


def test_out_of_range_pages_keep_image_volume_pairing(tmp_path):
    """Requesting a page beyond the stack must SKIP it consistently in
    both the image rows and the volume lookup — the unfiltered request
    zipped against the filtered frames paired image i with volume 999."""
    info, _ = _two_fish(tmp_path)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    ds_ok = XLFMDataset(fish, info["lenslet_file"], img_shape=(96, 96),
                        images_to_use=[0, 1], n_depths_to_fill=8)
    ds = XLFMDataset(fish, info["lenslet_file"], img_shape=(96, 96),
                     images_to_use=[0, 999, 1], n_depths_to_fill=8)
    assert ds.images_to_use == [0, 1] and len(ds) == 2
    np.testing.assert_array_equal(ds.vols, ds_ok.vols)
    np.testing.assert_array_equal(ds.stacked_views, ds_ok.stacked_views)


def test_pil_and_native_readers_filter_pages_identically(tmp_path):
    """pages=[0, 99, 1] must load pages [0, 1] from BOTH readers (the PIL
    path used to stop at the first invalid index)."""
    from cwfa_tpu.data import tiff as T
    from cwfa_tpu.data import native_tiff as NT
    arr = (np.random.rand(3, 8, 8) * 100).astype(np.float32)
    p = str(tmp_path / "s.tif")
    T.write_tiff_stack(p, arr)
    want = arr[[0, 1]]
    got_native = NT.read_tiff_stack_native(p, pages=[0, 99, 1])
    if got_native is not None:
        np.testing.assert_allclose(got_native, want)
    # force the PIL path
    import unittest.mock as mock
    with mock.patch.object(NT, "read_tiff_stack_native",
                           lambda *a, **k: None):
        got_pil = T.read_tiff_stack(p, pages=[0, 99, 1])
    np.testing.assert_allclose(got_pil, want)


def test_center_crop_vol_pads_small_volumes():
    """A volume smaller than the target must be zero-padded centered, not
    silently sliced from a negative start (a (D,44,44) corner fragment)."""
    from cwfa_tpu.data.dataset import _center_crop_vol_spatial
    v = np.arange(2 * 4 * 6, dtype=np.float32).reshape(2, 4, 6)
    out = _center_crop_vol_spatial(v, (8, 8))
    assert out.shape == (2, 8, 8)
    np.testing.assert_array_equal(out[:, 2:6, 1:7], v)
    assert out.sum() == v.sum()
    # crop case unchanged (reference h//2 - th//2 start)
    out2 = _center_crop_vol_spatial(v, (2, 4))
    np.testing.assert_array_equal(out2, v[:, 1:3, 1:5])


def test_volume_nan_and_inf_cleared(tmp_path):
    """One NaN or Inf voxel in a GT volume TIFF (a common RL-deconvolution
    artifact) must be zeroed at load — it would otherwise poison the
    dataset-wide mean/std and surface as NaN loss far from the cause."""
    from cwfa_tpu.data.tiff import read_tiff_stack, write_tiff_stack
    info = make_synthetic_dataset(str(tmp_path), n_fish=1, n_frames=2,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    import glob as _g
    vf = sorted(_g.glob(fish + "/XLFM_stack/*000.tif"))[0]
    vol = read_tiff_stack(vf)
    vol[0, 0, 0] = np.nan
    vol[1, 1, 1] = np.inf
    write_tiff_stack(vf, vol)
    ds = load_xlfm_data(fish, info["lenslet_file"], vol_shape=(32, 32, 8),
                        img_shape=(96, 96), images_to_use=[0, 1],
                        n_depths_to_fill=8)
    assert np.all(np.isfinite(ds.vols))
    stats = ConcatXLFMDataset(ds).get_statistics()
    assert np.isfinite(stats.mean_vols) and np.isfinite(stats.std_vols)


def test_concat_negative_index_is_global(tmp_path):
    info = make_synthetic_dataset(str(tmp_path), n_fish=2, n_frames=2,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)
    dss = [load_xlfm_data(fd + "/SLNet_preprocessed", info["lenslet_file"],
                          vol_shape=(32, 32, 8), img_shape=(96, 96),
                          images_to_use=[0, 1], n_depths_to_fill=8,
                          ds_id=f"f{i}")
           for i, fd in enumerate(info["fish_dirs"])]
    cat = ConcatXLFMDataset(*dss)
    views_neg, vol_neg, _, _ = cat[-1]
    views_last, vol_last, _, _ = cat[len(cat) - 1]
    np.testing.assert_array_equal(views_neg, views_last)
    np.testing.assert_array_equal(vol_neg, vol_last)
    assert cat.locate(-1) == (1, 1)
    import pytest as _pt
    with _pt.raises(IndexError):
        cat[-(len(cat) + 1)]


def test_volume_glob_requires_exact_frame_number(tmp_path):
    """*005.tif must not match a 1005-suffixed file (>=1001-frame
    datasets): a missing volume raises instead of silently pairing the
    wrong frame."""
    import shutil
    info = make_synthetic_dataset(str(tmp_path), n_fish=1, n_frames=2,
                                  n_depths=8, vol_side=32, img_size=96,
                                  n_lenslets=4, view_size=32)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    import glob as _g
    vols = sorted(_g.glob(fish + "/XLFM_stack/*.tif"))
    # frame 1's volume renamed to a 1001-suffix: suffix-glob would match it
    v1 = [v for v in vols if v.endswith("001.tif")][0]
    shutil.move(v1, v1.replace("001.tif", "1001.tif"))
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        load_xlfm_data(fish, info["lenslet_file"], vol_shape=(32, 32, 8),
                       img_shape=(96, 96), images_to_use=[0, 1],
                       n_depths_to_fill=8)
