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


@pytest.mark.parametrize("n,i0,il", [
    (2880, 1140, 600),   # reference object window in the A=120/B=24 split
    (180, 37, 81),       # four-step (A=90/B=2), unaligned lead/tail
    (180, 0, 180),       # full window == full transform
    (60, 13, 20),        # dense single-matmul branch (n <= 128)
])
def test_fft_last_window_oracle(n, i0, il):
    """Windowed-input DFT == DFT of the zero-padded signal, real and
    complex inputs, with and without rfft out_len truncation — in BOTH
    stage forms (four-step and dense single-GEMM) plus the auto pick."""
    rng = np.random.RandomState(4)
    x = rng.randn(2, il).astype(np.float32)
    pad = np.zeros((2, n), np.float32)
    pad[:, i0:i0 + il] = x
    want = np.fft.fft(pad)
    for dense in (None, True, False):
        yr, yi = gf.fft_last_window(jnp.asarray(x), None, i0, n, dense=dense)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert np.abs(got - want).max() <= 2e-5 * np.abs(want).max(), dense
    # complex input (the H pass of rfft2_window_input)
    xi = rng.randn(2, il).astype(np.float32)
    padi = np.zeros((2, n), np.float32)
    padi[:, i0:i0 + il] = xi
    wantc = np.fft.fft(pad + 1j * padi)
    for dense in (None, True, False):
        yr, yi = gf.fft_last_window(jnp.asarray(x), jnp.asarray(xi), i0, n,
                                    dense=dense)
        gotc = np.asarray(yr) + 1j * np.asarray(yi)
        assert np.abs(gotc - wantc).max() <= 2e-5 * np.abs(wantc).max(), dense
    # out_len truncation (the rfft bin cut)
    keep = n // 2 + 1
    for dense in (None, True, False):
        yr, yi = gf.fft_last_window(jnp.asarray(x), None, i0, n,
                                    out_len=keep, dense=dense)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert got.shape[-1] == keep
        assert np.abs(got - want[:, :keep]).max() \
            <= 2e-5 * np.abs(want).max(), dense


@pytest.mark.parametrize("h,w,hi,wi,off", [
    (48, 96, 20, 30, None),     # centered (the _pad_center convention)
    (60, 90, 60, 17, (0, 5)),   # full-H window, explicit corner offset
    (96, 120, 31, 1, None),     # 1-wide window
])
def test_rfft2_window_input_oracle(h, w, hi, wi, off):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, hi, wi).astype(np.float32)
    h0, w0 = off if off else ((h - hi) // 2, (w - wi) // 2)
    pad = np.zeros((2, 3, h, w), np.float32)
    pad[:, :, h0:h0 + hi, w0:w0 + wi] = x
    want = np.fft.rfft2(pad)
    zr, zi = gf.rfft2_window_input_gemm_pair(jnp.asarray(x), (h, w), h0, w0)
    got = np.asarray(zr) + 1j * np.asarray(zi)
    assert np.abs(got - want).max() <= 2e-5 * (np.abs(want).max() + 1e-9)


def test_rfft2_padded_dispatch(monkeypatch):
    """rfft2_padded == rfft2(pad_center(x)) on both carriers."""
    from cwfa_tpu.ops.fft_conv import rfft2_padded, _pad_center
    rng = np.random.RandomState(6)
    x = rng.randn(1, 2, 18, 25).astype(np.float32)
    full = (48, 60)
    want = np.fft.rfft2(np.asarray(_pad_center(jnp.asarray(x), full)))
    assert backend_has_fft()
    got_x = np.asarray(rfft2_padded(jnp.asarray(x), full))
    assert np.abs(got_x - want).max() <= 2e-5 * np.abs(want).max()
    monkeypatch.setenv("CWFA_FFT_IMPL", "gemm")
    got_g = rfft2_padded(jnp.asarray(x), full)
    assert isinstance(got_g, SpecPair)
    got_g = np.asarray(got_g.re) + 1j * np.asarray(got_g.im)
    assert np.abs(got_g - want).max() <= 2e-5 * np.abs(want).max()


@pytest.mark.parametrize("n,nb,w0,wl,real_out", [
    (180, 91, -17, 60, True),    # Hermitian-fold bins, pre-roll start
    (180, 180, 37, 81, False),   # full spectrum, complex out
    (96, 49, 0, 40, True),
])
def test_idft_window_last_forms(n, nb, w0, wl, real_out):
    """The dense single-GEMM windowed inverse == the four-step form ==
    numpy (leading-bin zero-tail semantics), both output flavors."""
    rng = np.random.RandomState(7)
    xr = rng.randn(2, nb).astype(np.float32)
    xi = rng.randn(2, nb).astype(np.float32)
    spec = np.zeros((2, n), np.complex64)
    spec[:, :nb] = xr + 1j * xi
    full = np.fft.ifft(spec) * n                      # unscaled inverse
    want = full[:, (np.arange(w0, w0 + wl)) % n]
    outs = []
    for dense in (None, True, False):
        yr, yi = gf.idft_window_last(jnp.asarray(xr), jnp.asarray(xi),
                                     w0, wl, real_out=real_out, n=n,
                                     dense=dense)
        got = np.asarray(yr) + (0 if real_out else 1j * np.asarray(yi))
        ref = want.real if real_out else want
        assert np.abs(got - ref).max() <= 2e-5 * np.abs(want).max(), dense
        outs.append(got)
    # auto == one of the pinned forms exactly (dispatch, not new math)
    assert any(np.array_equal(outs[0], o) for o in outs[1:])


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
    # depth-pair packing on an even (-3) axis matches to f32; an odd
    # axis (3 planes, as here) falls back to the unpacked path exactly
    odd = np.asarray(gf.irfft2_window_gemm_pair(
        jnp.asarray(spec.real), jnp.asarray(spec.imag), (h, w),
        h_win, w_win, pack_depth=True))
    np.testing.assert_allclose(odd, got, rtol=0, atol=0)
    spec4 = np.concatenate([spec, spec[:, :1]], axis=1)
    want4 = np.concatenate([want, want[:, :1]], axis=1)
    packed = np.asarray(gf.irfft2_window_gemm_pair(
        jnp.asarray(spec4.real), jnp.asarray(spec4.imag), (h, w),
        h_win, w_win, pack_depth=True))
    assert np.abs(packed - want4).max() <= 2e-5 * (np.abs(want4).max() + 1e-9)


def test_karatsuba_cmatmul_oracle(monkeypatch):
    """CWFA_GEMM_FFT_KARATSUBA=1 (Gauss 3-dot complex GEMMs — measured
    slower on v5e, kept as an A/B rig) stays exact to f32 roundoff on
    both shipped chains and on the factor-override path."""
    rng = np.random.RandomState(7)
    x = rng.randn(2, 3, 60, 60).astype(np.float32)
    s = (144, 144)
    xp = np.zeros((2, 3) + s, np.float32)
    xp[:, :, 42:102, 42:102] = x
    want = np.fft.rfft2(xp)
    spec = np.fft.rfft2(rng.randn(2, 3, *s).astype(np.float32))
    from cwfa_tpu.ops.fft_conv import fftshift2d_real
    full = np.asarray(fftshift2d_real(jnp.asarray(
        np.fft.irfft2(spec, s=s).astype(np.float32))))
    want_inv = full[:, :, 30:90, 40:90]
    monkeypatch.setenv("CWFA_GEMM_FFT_KARATSUBA", "1")
    for factor in (None, "48"):         # dense-W + four-step-H; override A
        if factor:
            monkeypatch.setenv("CWFA_GEMM_FFT_FACTOR", factor)
        yr, yi = gf.rfft2_window_input_gemm_pair(jnp.asarray(x), s)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert np.abs(got - want).max() <= 2e-5 * np.abs(want).max()
        got_inv = np.asarray(gf.irfft2_window_gemm_pair(
            jnp.asarray(spec.real.astype(np.float32)),
            jnp.asarray(spec.imag.astype(np.float32)),
            s, (30, 60), (40, 50)))
        assert np.abs(got_inv - want_inv).max() <= \
            2e-5 * (np.abs(want_inv).max() + 1e-9)
