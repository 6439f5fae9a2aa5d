"""Oracle tests for the matmul-DFT FFT fallback (ops/gemm_fft) and the
SpecPair carrier plumbing (ops/fft_conv), vs numpy's FFT and vs the
XLA-FFT deconvolution path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.ops import gemm_fft as gf
from cwfa_tpu.ops.fft_conv import (SpecPair, backend_has_fft, precompute_otf,
                                   rfft2, spec_conj, spec_mul,
                                   xlfm_forward_project)
from cwfa_tpu.ops.deconv import xlfm_deconvolve


@pytest.mark.parametrize("h,w", [(60, 60), (48, 96), (30, 180), (12, 49)])
def test_rfft2_irfft2_oracle(h, w):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, h, w).astype(np.float32)
    want = np.fft.rfft2(x)
    got = np.asarray(gf.rfft2_gemm(jnp.asarray(x)))
    assert np.abs(got - want).max() <= 2e-5 * np.abs(want).max()
    back = np.asarray(gf.irfft2_gemm(jnp.asarray(want.astype(np.complex64)),
                                     (h, w)))
    assert np.abs(back - x).max() <= 2e-5 * np.abs(x).max()


def test_fft_last_four_step_vs_numpy():
    # N=2880 exercises the A=120/B=24 four-step split of the reference
    # CLI canvas; N=60 the single dense-DFT branch
    rng = np.random.RandomState(1)
    for n in (2880, 60):
        x = rng.randn(3, n).astype(np.float32)
        yr, yi = gf.fft_last(jnp.asarray(x), None)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = np.fft.fft(x)
        assert np.abs(got - want).max() <= 2e-5 * np.abs(want).max()
        # inverse (unscaled) round-trips
        br, _bi = gf.fft_last(yr, yi, inverse=True)
        assert np.abs(np.asarray(br) / n - x).max() <= 2e-5


def test_spec_pair_helpers():
    a = SpecPair(jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, -1.0]))
    b = SpecPair(jnp.asarray([2.0, 0.5]), jnp.asarray([-1.0, 4.0]))
    ca = np.asarray(a.re) + 1j * np.asarray(a.im)
    cb = np.asarray(b.re) + 1j * np.asarray(b.im)
    m = spec_mul(a, b)
    np.testing.assert_allclose(np.asarray(m.re) + 1j * np.asarray(m.im),
                               ca * cb, rtol=1e-6)
    c = spec_conj(a)
    np.testing.assert_allclose(np.asarray(c.im), -np.asarray(a.im))
    assert a.shape == (2,)
    with pytest.raises(AssertionError):
        spec_mul(a, jnp.asarray([1.0 + 0j]))


def test_deconv_gemm_matches_xla_path(monkeypatch):
    """The full RL deconvolution through the SpecPair/matmul-DFT carrier
    must agree with the XLA-FFT path (the axon TPU backend executes no
    FFT or complex64 HLO, so this fallback IS the TPU deconv path)."""
    rng = np.random.RandomState(2)
    d, s, p = 3, 18, 30
    yy, xx = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
    psf = np.stack([np.exp(-(((yy - p / 2) ** 2 + (xx - p / 2) ** 2)
                             / (2 * (1.5 + k) ** 2))) for k in range(d)])
    psf = (psf / psf.sum(axis=(-2, -1), keepdims=True))[None].astype(
        np.float32)
    # smooth positive object: RL's ratio img/(est+1e-8) is chaotic where
    # est ~ 0 (f32-level spectral differences blow up there — both
    # implementations still converge to the same fixed point), so the
    # implementation-equality check uses bounded denominators
    vol = (1.0 + rng.rand(1, d, s, s)).astype(np.float32) * 10.0

    assert backend_has_fft()
    otf_x, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
    img_x = xlfm_forward_project(jnp.asarray(vol), otf_x, full_hw,
                                 psf_hw=(p, p))
    rec_x, est_x = xlfm_deconvolve(otf_x, img_x, n_iter=8, obj_hw=(s, s),
                                   roi_depths=d, full_hw=full_hw)

    monkeypatch.setenv("CWFA_FFT_IMPL", "gemm")
    assert not backend_has_fft()
    otf_g, full_g = precompute_otf(jnp.asarray(psf), (s, s))
    assert isinstance(otf_g, SpecPair) and full_g == full_hw
    img_g = xlfm_forward_project(jnp.asarray(vol), otf_g, full_hw,
                                 psf_hw=(p, p))
    np.testing.assert_allclose(np.asarray(img_g), np.asarray(img_x),
                               rtol=1e-4, atol=1e-5)
    rec_g, est_g = xlfm_deconvolve(otf_g, img_g, n_iter=8, obj_hw=(s, s),
                                   roi_depths=d, full_hw=full_hw)
    np.testing.assert_allclose(np.asarray(rec_g), np.asarray(rec_x),
                               rtol=2e-3, atol=2e-4)
    # the gemm path evaluates img_est only on the camera-support window
    # (zeros elsewhere; the RL update never reads outside it)
    i0, i1 = (full_hw[0] - p) // 2, (full_hw[1] - p) // 2
    win = np.s_[:, :, i0:i0 + p, i1:i1 + p]
    np.testing.assert_allclose(np.asarray(est_g)[win],
                               np.asarray(est_x)[win],
                               rtol=2e-3, atol=1e-5)
    outside = np.asarray(est_g).copy()
    outside[win] = 0.0
    assert np.all(outside == 0.0)
    # depth chunking through the pair carrier as well
    rec_c, _ = xlfm_deconvolve(otf_g, img_g, n_iter=8, obj_hw=(s, s),
                               roi_depths=d, depth_chunk=2, full_hw=full_hw)
    np.testing.assert_allclose(np.asarray(rec_c), np.asarray(rec_g),
                               rtol=1e-5, atol=1e-6)


def test_forward_project_chunked_pair(monkeypatch):
    monkeypatch.setenv("CWFA_FFT_IMPL", "gemm")
    rng = np.random.RandomState(3)
    psf = rng.rand(1, 4, 10, 10).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    vol = rng.rand(2, 4, 16, 16).astype(np.float32)
    otf, full_hw = precompute_otf(jnp.asarray(psf), (16, 16))
    full = xlfm_forward_project(jnp.asarray(vol), otf, full_hw,
                                psf_hw=(10, 10))
    chunked = xlfm_forward_project(jnp.asarray(vol), otf, full_hw,
                                   psf_hw=(10, 10), depth_chunk=3)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("h,w,h_win,w_win", [
    (48, 96, (10, 20), (30, 24)),
    (60, 60, (0, 60), (0, 60)),
    (96, 120, (40, 17), (55, 31)),
])
def test_irfft2_window_oracle(h, w, h_win, w_win):
    """Windowed inverse == full inverse + fftshift + crop (the RL
    back-projection composition), to f32 accuracy."""
    from cwfa_tpu.ops.fft_conv import fftshift2d_real
    rng = np.random.RandomState(0)
    spec = np.fft.rfft2(rng.randn(2, 3, h, w).astype(np.float32)) \
        .astype(np.complex64)
    full = np.asarray(fftshift2d_real(jnp.asarray(
        np.fft.irfft2(spec, s=(h, w)).astype(np.float32))))
    (h0, hl), (w0, wl) = h_win, w_win
    want = full[:, :, h0:h0 + hl, w0:w0 + wl]
    got = np.asarray(gf.irfft2_window_gemm_pair(
        jnp.asarray(spec.real), jnp.asarray(spec.imag), (h, w),
        h_win, w_win))
    assert np.abs(got - want).max() <= 2e-5 * (np.abs(want).max() + 1e-9)
