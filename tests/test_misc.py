"""Tests for auxiliary pieces: XLFMNet training, plots, projections,
TB writer integration, ActNorm, permutation reset, losses."""

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.engine import losses as L
from cwfa_tpu.flow.actnorm import actnorm, actnorm_data_init, init_actnorm


def test_xlfmnet_training_reduces_loss():
    from cwfa_tpu.engine.xlfmnet_train import train_xlfmnet
    from cwfa_tpu.models.xlfmnet import XLFMNetSpec
    rng = np.random.RandomState(0)
    spec = XLFMNetSpec(in_views=4, out_depths=8)
    # needs H,W divisible by 2^(depth-1)=16
    views = jnp.asarray(rng.rand(2, 4, 32, 32).astype(np.float32))
    vols = jnp.asarray(rng.rand(2, 8, 32, 32).astype(np.float32))
    params, state, losses = train_xlfmnet(spec, views, vols, n_steps=30,
                                          learning_rate=1e-3)
    assert np.isfinite(losses).all()
    # actual learning, not just a sane trajectory: a no-op optimizer
    # (detached grads, dropped update) keeps the loss flat and must fail
    assert min(losses[-4:]) < losses[0]


def test_actnorm_data_init_and_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray((3.0 * rng.randn(8, 4, 5, 5) + 2.0).astype(np.float32))
    p = actnorm_data_init(x)
    y, ld_f = actnorm(p, x)
    # normalized per channel
    np.testing.assert_allclose(np.asarray(y).mean(axis=(0, 2, 3)), 0,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(y).std(axis=(0, 2, 3)), 1,
                               atol=1e-3)
    x2, ld_r = actnorm(p, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_r), rtol=1e-5)


def test_reset_permutations():
    from cwfa_tpu.models.cwf import build_step_specs, reset_permutations
    spec = build_step_specs(16, 16, 1, 4, "CAT", 8, True, True, False, 7)[0]
    new = reset_permutations(spec)
    # channel perms untouched, spatial perms regenerated
    for old_e, new_e in zip(spec.perms, new.perms):
        assert old_e[0] == new_e[0]
        if old_e[0] == "channel":
            np.testing.assert_array_equal(old_e[1], new_e[1])


def test_weighted_mse_loss_reference_semantics():
    """Masked where either side is below 5% of its shifted max; mean over ALL
    elements (losses.py:477-500)."""
    gt = jnp.asarray(np.array([[[[0.0, 10.0], [0.5, 9.0]]]], np.float32))
    pred = jnp.asarray(np.array([[[[0.1, 8.0], [0.4, 0.0]]]], np.float32))
    got = float(L.weighted_mse_loss(gt, pred))
    out_shift = np.asarray(gt) - 0.0
    tgt_shift = np.asarray(pred) - 0.0
    om = out_shift > out_shift.max() * 0.05
    tm = tgt_shift > tgt_shift.max() * 0.05
    want = ((np.asarray(gt) - np.asarray(pred)) ** 2 * om * tm).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_psnr_special_cases():
    z = jnp.zeros((4, 4))
    assert float(L.psnr(z, z)) == 0.0           # both empty
    o = jnp.ones((4, 4))
    assert float(L.psnr(o, o)) == 100.0         # identical, nonzero
    assert 5 < float(L.psnr(o, o * 0.5)) < 100


def test_projections_shapes():
    from cwfa_tpu.utils.projections import (volume_2_projections,
                                            composite_projection,
                                            create_image_pyramid)
    vol = np.random.RandomState(2).rand(1, 8, 16, 16).astype(np.float32)
    mip = volume_2_projections(vol)
    assert mip.shape == (1, 16 + 16 + 2, 16 + 16 + 2)
    comp = composite_projection(vol[0])
    assert comp.shape == (16 + 8, 16 + 8)
    pyr = create_image_pyramid([np.random.rand(16, 16),
                                np.random.rand(8, 8)])
    assert pyr.ndim == 2 and np.isfinite(pyr).all()


def test_plot_distributions():
    from cwfa_tpu.utils.plots import plot_distributions, figure_to_array
    fig = plot_distributions(np.random.randn(100), np.random.randn(100) + 1)
    arr = figure_to_array(fig)
    assert arr.ndim == 3 and arr.shape[2] == 3


def test_tb_writer_record_framing(tmp_path):
    """TFRecord framing + masked CRC32C of the event-file writer."""
    import glob
    import struct
    from cwfa_tpu.utils.tb_writer import SummaryWriter, _masked_crc
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("a/b", 1.5, 1)
    w.add_text("t", "hello", 0)
    w.add_image("img", np.random.rand(8, 8), 2)
    w.close()
    data = open(glob.glob(str(tmp_path / "events.*"))[0], "rb").read()
    off = n = 0
    while off < len(data):
        (ln,) = struct.unpack("<Q", data[off:off + 8])
        (hc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hc == _masked_crc(data[off:off + 8])
        rec = data[off + 12:off + 12 + ln]
        (dc,) = struct.unpack("<I", data[off + 12 + ln:off + 16 + ln])
        assert dc == _masked_crc(rec)
        off += 16 + ln
        n += 1
    assert n == 4  # file_version + 3 events


def test_native_tiff_roundtrip_and_prefetch(tmp_path):
    from cwfa_tpu.data.native_tiff import (native_available,
                                           write_tiff_stack_native,
                                           read_tiff_stack_native,
                                           PrefetchingTiffReader)
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    arr = (np.random.rand(4, 24, 16) * 1000).astype(np.float32)
    p = str(tmp_path / "n.tif")
    assert write_tiff_stack_native(p, arr)
    back = read_tiff_stack_native(p)
    np.testing.assert_allclose(back, arr, atol=1e-6)
    with PrefetchingTiffReader(p, pages=[0, 2, 3]) as it:
        got = {ix: f.sum() for ix, f in it}
    assert sorted(got) == [0, 2, 3]
    for ix in got:
        np.testing.assert_allclose(got[ix], arr[ix].sum(), rtol=1e-5)


def test_native_prefetch_rejects_geometry_mismatch(tmp_path):
    """A multipage TIFF whose pages differ in size must fail LOUDLY from
    the native prefetcher (a larger later page would otherwise overflow
    the page-0-sized buffer; a silent stop would read as a shorter
    dataset), and sizing must follow the FIRST SELECTED page."""
    from PIL import Image

    from cwfa_tpu.data.native_tiff import (native_available,
                                           PrefetchingTiffReader)
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    small = Image.fromarray(np.arange(64, dtype=np.uint16).reshape(8, 8))
    big = Image.fromarray(np.arange(256, dtype=np.uint16).reshape(16, 16))
    p = str(tmp_path / "mixed.tif")
    small.save(p, format="TIFF", save_all=True, append_images=[big])

    import pytest
    with PrefetchingTiffReader(p, pages=[0, 1]) as it:
        frames = []
        with pytest.raises(IOError, match="geometry"):
            for ix, f in it:
                frames.append((ix, f.copy()))
    # page 0 itself decodes fine before the mismatch surfaces
    assert [ix for ix, _ in frames] == [0]
    np.testing.assert_array_equal(
        frames[0][1], np.arange(64, dtype=np.uint16).reshape(8, 8))

    # selecting ONLY the larger page sizes buffers from it (not page 0)
    with PrefetchingTiffReader(p, pages=[1]) as it:
        got = dict((ix, f.copy()) for ix, f in it)
    np.testing.assert_array_equal(
        got[1], np.arange(256, dtype=np.uint16).reshape(16, 16))


def test_sample_z_helpers_contracts():
    """sample_z_truncated (CWFA.py:47-64) and sample_z_rev_like
    (CWFA.py:66-82): zeros at T=0, truncation bounds, the rev helper's
    (B, 3W, H, W) layout variant and same_size/shape-tuple modes."""
    import jax
    import jax.numpy as jnp

    from cwfa_tpu.models.cwfa_model import (sample_z_rev_like,
                                            sample_z_truncated)

    k = jax.random.PRNGKey(0)
    assert not sample_z_truncated(k, (2, 3), 0.0).any()
    z = sample_z_truncated(k, (512,), 0.7)
    assert float(jnp.abs(z).max()) <= 0.7

    x = jnp.zeros((2, 5, 8, 4))
    assert sample_z_rev_like(k, x, 0.0).shape == (2, 12, 8, 4)
    assert not sample_z_rev_like(k, x, 0.0).any()
    assert sample_z_rev_like(k, x, 0.5, same_size=True).shape == x.shape
    assert sample_z_rev_like(k, (3, 4), 0.5).shape == (3, 4)
    s = sample_z_rev_like(k, x, 0.25, same_size=True)
    assert 0 < float(jnp.std(s)) < 0.5     # gaussian scaled by temperature


def test_dropout_family_p1_clean_zeros_and_grads():
    """p>=1 must give torch's clean zeros with ZERO gradients for every
    dropout variant — the x/keep forms divided by zero (dropout2d/dropout
    NaN'd the backward pass, drop_path NaN'd the FORWARD)."""
    import jax
    import jax.numpy as jnp

    from cwfa_tpu import nn as cnn

    k = jax.random.PRNGKey(0)
    x = jnp.ones((2, 3, 4, 4))
    for fn in (cnn.dropout, cnn.dropout2d, cnn.drop_path):
        y = fn(x, 1.0, k)
        assert not np.asarray(y).any(), fn.__name__
        g = jax.grad(lambda v: jnp.sum(fn(v, 1.0, k)))(x)
        assert np.isfinite(np.asarray(g)).all(), fn.__name__
        assert not np.asarray(g).any(), fn.__name__
        # p=0 / no-rng fast paths stay identity
        np.testing.assert_array_equal(np.asarray(fn(x, 0.0, k)),
                                      np.asarray(x))
        np.testing.assert_array_equal(np.asarray(fn(x, 1.0, None)),
                                      np.asarray(x))
