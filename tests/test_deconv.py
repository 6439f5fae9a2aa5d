"""FFT convolution + Richardson-Lucy deconvolution tests (SURVEY.md §4:
RL fixed-point test on a synthetic PSF)."""

import numpy as np
import jax.numpy as jnp

from cwfa_tpu.ops import (
    fftshift2d_real, precompute_otf, xlfm_forward_project, xlfm_deconvolve)


def test_fftshift_matches_reference_roll():
    x = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    got = np.asarray(fftshift2d_real(jnp.asarray(x)))
    # reference roll: n//2 (+1 if odd) moved front<-back
    want = np.roll(x, 2, axis=2)           # 4//2 = 2
    want = np.roll(want, 3, axis=3)        # 5//2+1 = 3
    np.testing.assert_allclose(got, want)


def test_fft_conv_delta_psf_is_identity():
    """A centered delta PSF must reproduce the object in the image center."""
    d, s, p = 2, 16, 32
    psf = np.zeros((1, d, p, p), np.float32)
    psf[0, :, p // 2, p // 2] = 1.0
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
    rng = np.random.RandomState(0)
    vol = jnp.asarray(np.abs(rng.rand(1, d, s, s)).astype(np.float32))
    img = np.asarray(xlfm_forward_project(vol, otf, full_hw, psf_hw=(p, p)))
    # image = sum over depths of the (centered) object
    want = np.asarray(vol.sum(1))[0]
    h0 = (p - s) // 2
    np.testing.assert_allclose(img[0, 0, h0:h0 + s, h0:h0 + s], want,
                               atol=1e-3)


def test_deconv_recovers_blobs():
    """RL on a synthetic gaussian PSF recovers blob positions (energy
    concentrates at the right depth/locations)."""
    d, s, p = 4, 24, 48
    yy, xx = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
    psf = np.zeros((1, d, p, p), np.float32)
    for k in range(d):
        sig = 1.0 + 0.8 * abs(k - d / 2)
        off = (k - d / 2) * 4
        psf[0, k] = np.exp(-(((yy - p / 2 - off) ** 2 + (xx - p / 2) ** 2)
                             / (2 * sig ** 2)))
        psf[0, k] /= psf[0, k].sum()
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))

    vol = np.zeros((1, d, s, s), np.float32)
    vol[0, 1, 8, 8] = 100.0
    vol[0, 2, 16, 18] = 80.0
    img = xlfm_forward_project(jnp.asarray(vol), otf, full_hw, psf_hw=(p, p))

    recon, img_est = xlfm_deconvolve(otf, img, n_iter=30, obj_hw=(s, s),
                                     roi_depths=d)
    recon = np.asarray(recon)[0]
    assert np.isfinite(recon).all()
    # energy at the true depth/position dominates its plane
    assert recon[1].argmax() == 8 * s + 8
    assert recon[2].argmax() == 16 * s + 18
    # depth assignment: plane 1 holds more energy near (8,8) than plane 3
    patch = (slice(6, 11), slice(6, 11))
    assert recon[1][patch].sum() > 3 * recon[3][patch].sum()


def test_deconv_depth_chunking_matches():
    d, s, p = 4, 16, 32
    rng = np.random.RandomState(1)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
    vol = jnp.asarray(np.abs(rng.rand(1, d, s, s)).astype(np.float32))
    img = xlfm_forward_project(vol, otf, full_hw, psf_hw=(p, p))
    r_full, _ = xlfm_deconvolve(otf, img, n_iter=3, obj_hw=(s, s), roi_depths=d)
    r_chunk, _ = xlfm_deconvolve(otf, img, n_iter=3, obj_hw=(s, s),
                                 roi_depths=d, depth_chunk=2)
    np.testing.assert_allclose(np.asarray(r_full), np.asarray(r_chunk),
                               rtol=1e-4, atol=1e-5)


def test_deconv_odd_full_width_needs_full_hw():
    """When obj+psf gives an ODD padded width, the rFFT bin count is
    parity-ambiguous ((W-1)//2+1 == (W-1)//2+1 for W-1 even) — the inferred
    even canvas is one pixel short and silently shifts the recon.  Passing
    the true full_hw from precompute_otf must keep RL recovering the blob
    exactly (regression for the inferred-width bug)."""
    d, s, p = 2, 17, 32                      # full = 17+32 = 49 (odd)
    yy, xx = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
    psf = np.zeros((1, d, p, p), np.float32)
    for k in range(d):
        sig = 1.5 + k
        psf[0, k] = np.exp(-(((yy - p / 2) ** 2 + (xx - p / 2) ** 2)
                             / (2 * sig ** 2)))
        psf[0, k] /= psf[0, k].sum()
    # smooth=False replays the reference's exact obj+psf canvas so the
    # odd-width ambiguity is reachable (the smooth default rounds to even)
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s), smooth=False)
    assert full_hw[1] % 2 == 1               # the ambiguous case

    vol = np.zeros((1, d, s, s), np.float32)
    vol[0, 0, 5, 11] = 100.0
    img = xlfm_forward_project(jnp.asarray(vol), otf, full_hw, psf_hw=(p, p))
    recon, _ = xlfm_deconvolve(otf, img, n_iter=40, obj_hw=(s, s),
                               roi_depths=d, full_hw=full_hw)
    recon = np.asarray(recon)[0]
    assert np.isfinite(recon).all()
    assert recon[0].argmax() == 5 * s + 11


def test_deconv_init_obj_chaining_identical():
    """n1-then-n2 chained calls via init_obj equal one n1+n2 call when
    roi_depths == D (the resume/segmentation path the axon tunnel's
    ~1-min device-program limit requires)."""
    rng = np.random.RandomState(5)
    # even D: the ROI formula lo=D//2-roi//2, hi=D//2+roi//2 keeps all
    # depths only when D is even (odd D zeroes the last depth even at
    # roi==D — reference floor arithmetic, utils.py:736-737)
    d, s, p = 4, 16, 24
    psf = rng.rand(1, d, p, p).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    vol = (1.0 + rng.rand(1, d, s, s)).astype(np.float32)
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
    img = xlfm_forward_project(jnp.asarray(vol), otf, full_hw, psf_hw=(p, p))

    one, _ = xlfm_deconvolve(otf, img, n_iter=8, obj_hw=(s, s),
                             roi_depths=d, full_hw=full_hw)
    mid, _ = xlfm_deconvolve(otf, img, n_iter=5, obj_hw=(s, s),
                             roi_depths=d, full_hw=full_hw)
    two, _ = xlfm_deconvolve(otf, img, n_iter=3, obj_hw=(s, s),
                             roi_depths=d, full_hw=full_hw, init_obj=mid)
    np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                               rtol=1e-6, atol=1e-7)


def test_median_nonzero_bitsearch_matches_sort():
    """The 32-step bit-descent median must return the EXACT element the
    full-sort form picks (torch t[t!=0].median(), the lower-middle of the
    sorted nonzeros) — duplicates, negatives, zeros, infs, even/odd
    counts."""
    from cwfa_tpu.ops.deconv import _median_nonzero, _median_nonzero_sort
    rng = np.random.RandomState(3)
    cases = [
        (rng.randn(97) * 100).astype(np.float32),          # negatives, odd
        (rng.randn(50) * 1e-3).astype(np.float32),         # even count
        np.concatenate([np.zeros(10), rng.rand(50)]).astype(np.float32),
        np.repeat(np.array([0.5, -2.0, 3.0, 3.0]), 7).astype(np.float32),
        np.zeros(8, np.float32),                           # all zero -> 0
        np.array([5.0], np.float32),
        np.concatenate([rng.rand(64), [np.inf]]).astype(np.float32),
    ]
    for arr in cases:
        got = float(_median_nonzero(jnp.asarray(arr)))
        want = float(_median_nonzero_sort(jnp.asarray(arr)))
        assert got == want, (arr[:8], got, want)


def test_smooth_canvas_exact_for_odd_obj_plus_psf(monkeypatch):
    """The 5-smooth canvas rounding must preserve the canvas PARITY to be
    exact: every downstream offset (pad_center floor-halves, fftshift
    roll, center crops) moves by (m-n)/2 only when the canvas grows by an
    even amount.  Rounding an odd obj+psf canvas to an even size shifted
    the recentered forward projection by one pixel (regression; the even
    configs agreed all along).  Checked on both spectrum carriers."""
    d, s, p = 3, 15, 10                      # obj+psf = 25 (odd)
    rng = np.random.RandomState(11)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    vol = jnp.asarray(np.abs(rng.rand(1, d, s, s)).astype(np.float32))
    for impl in ("xla", "gemm"):
        monkeypatch.setenv("CWFA_FFT_IMPL", impl)
        otf_s, hw_s = precompute_otf(jnp.asarray(psf), (s, s))
        otf_e, hw_e = precompute_otf(jnp.asarray(psf), (s, s), smooth=False)
        assert hw_e == (25, 25)
        assert hw_s[0] % 2 == 1 and hw_s[0] >= 25    # odd stays odd
        img_s = xlfm_forward_project(vol, otf_s, hw_s, psf_hw=(p, p))
        img_e = xlfm_forward_project(vol, otf_e, hw_e, psf_hw=(p, p))
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_e),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"forward mismatch ({impl})")
        r_s, _ = xlfm_deconvolve(otf_s, img_e, n_iter=4, obj_hw=(s, s),
                                 roi_depths=d, full_hw=hw_s)
        r_e, _ = xlfm_deconvolve(otf_e, img_e, n_iter=4, obj_hw=(s, s),
                                 roi_depths=d, full_hw=hw_e)
        np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_e),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"deconv mismatch ({impl})")


def test_deconv_ragged_depth_chunk_matches(monkeypatch):
    """A depth count with no divisor near the requested chunk zero-pads to
    a whole slab instead of silently degrading the chunk to 1 (a prime
    n_depths previously ran one 1-plane scan step per depth).  Pad depths
    have zero OTF planes, so the result is exact; checked on both
    carriers (the SpecPair path also exercises the window-sized img_est
    loop carry)."""
    d, s, p = 5, 16, 32                      # 5 is prime; chunk 3 -> pad 1
    rng = np.random.RandomState(13)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    vol = jnp.asarray(np.abs(rng.rand(1, d, s, s)).astype(np.float32))
    for impl in ("xla", "gemm"):
        monkeypatch.setenv("CWFA_FFT_IMPL", impl)
        otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
        img = xlfm_forward_project(vol, otf, full_hw, psf_hw=(p, p))
        r_full, e_full = xlfm_deconvolve(otf, img, n_iter=3, obj_hw=(s, s),
                                         roi_depths=d, full_hw=full_hw)
        r_rag, e_rag = xlfm_deconvolve(otf, img, n_iter=3, obj_hw=(s, s),
                                       roi_depths=d, depth_chunk=3,
                                       full_hw=full_hw)
        assert r_rag.shape == (1, d, s, s)
        np.testing.assert_allclose(np.asarray(r_rag), np.asarray(r_full),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"volume mismatch ({impl})")
        np.testing.assert_allclose(np.asarray(e_rag), np.asarray(e_full),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"img_est mismatch ({impl})")


def test_deconv_fourier_sum_matches_per_depth(monkeypatch):
    """``fourier_sum`` (default) sums the forward projection over depth in
    the Fourier domain, so ONE single-plane inverse transform replaces one
    per depth slab.  Equivalent to the reference's per-depth
    relu-then-sum (utils.py:700) up to FFT roundoff: each per-depth plane
    is a circular convolution of nonnegative arrays, so the relu only
    clips ringing.  Checked on both spectrum carriers."""
    d, s, p = 4, 16, 32
    rng = np.random.RandomState(7)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    vol = jnp.asarray(np.abs(rng.rand(1, d, s, s)).astype(np.float32))
    for impl in ("xla", "gemm"):
        monkeypatch.setenv("CWFA_FFT_IMPL", impl)
        otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
        img = xlfm_forward_project(vol, otf, full_hw, psf_hw=(p, p))
        r_fs, e_fs = xlfm_deconvolve(otf, img, n_iter=6, obj_hw=(s, s),
                                     roi_depths=d, depth_chunk=2,
                                     full_hw=full_hw)
        r_pd, e_pd = xlfm_deconvolve(otf, img, n_iter=6, obj_hw=(s, s),
                                     roi_depths=d, depth_chunk=2,
                                     full_hw=full_hw, fourier_sum=False)
        np.testing.assert_allclose(np.asarray(r_fs), np.asarray(r_pd),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"volume mismatch ({impl})")
        np.testing.assert_allclose(np.asarray(e_fs), np.asarray(e_pd),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"img_est mismatch ({impl})")

def test_median_nonzero_batch_is_per_sample():
    """_median_nonzero_batch computes one median PER LEADING-AXIS SAMPLE
    (the RL clamp is a per-frame statistic, utils.py:701-703) — each row
    must equal the scalar form applied to that row alone."""
    from cwfa_tpu.ops.deconv import _median_nonzero, _median_nonzero_batch
    rng = np.random.RandomState(17)
    rows = np.stack([
        (rng.randn(81) * 100).astype(np.float32),
        np.concatenate([np.zeros(40), rng.rand(41)]).astype(np.float32),
        np.zeros(81, np.float32),
        (rng.rand(81) * 1e-3).astype(np.float32),
    ])
    got = np.asarray(_median_nonzero_batch(jnp.asarray(rows)))
    want = np.array([float(_median_nonzero(jnp.asarray(r))) for r in rows])
    np.testing.assert_array_equal(got, want)


def test_deconv_batched_matches_independent_runs(monkeypatch):
    """Batch-B deconvolution must equal B independent batch-1 runs — the
    per-frame median clamp is the load-bearing part (frames at different
    intensity scales have different clamp limits; a batch-global median
    couples them).  Checked on both spectrum carriers."""
    d, s, p = 3, 16, 32
    rng = np.random.RandomState(19)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    # two frames at wildly different scales -> different clamp medians
    vol_a = np.abs(rng.rand(1, d, s, s)).astype(np.float32)
    vol_b = (np.abs(rng.rand(1, d, s, s)) * 250.0).astype(np.float32)
    vol_b[0, :, 4:, :] = 0.0                 # sparse: clamp actually bites
    for impl in ("xla", "gemm"):
        monkeypatch.setenv("CWFA_FFT_IMPL", impl)
        otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
        img_a = xlfm_forward_project(jnp.asarray(vol_a), otf, full_hw,
                                     psf_hw=(p, p))
        img_b = xlfm_forward_project(jnp.asarray(vol_b), otf, full_hw,
                                     psf_hw=(p, p))
        img_ab = jnp.concatenate([img_a, img_b], axis=0)
        r_ab, e_ab = xlfm_deconvolve(otf, img_ab, n_iter=6, obj_hw=(s, s),
                                     roi_depths=d, full_hw=full_hw)
        r_a, e_a = xlfm_deconvolve(otf, img_a, n_iter=6, obj_hw=(s, s),
                                   roi_depths=d, full_hw=full_hw)
        r_b, e_b = xlfm_deconvolve(otf, img_b, n_iter=6, obj_hw=(s, s),
                                   roi_depths=d, full_hw=full_hw)
        np.testing.assert_allclose(np.asarray(r_ab[:1]), np.asarray(r_a),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"frame A mismatch ({impl})")
        np.testing.assert_allclose(np.asarray(r_ab[1:]), np.asarray(r_b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"frame B mismatch ({impl})")
        np.testing.assert_allclose(np.asarray(e_ab[:1]), np.asarray(e_a),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e_ab[1:]), np.asarray(e_b),
                                   rtol=1e-5, atol=1e-6)


def test_deconv_nan_freeze_is_per_frame():
    """A NaN in one frame freezes THAT frame's updates only — its
    batch-mates must keep iterating exactly as in their solo runs."""
    d, s, p = 2, 16, 32
    rng = np.random.RandomState(23)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
    vol = np.abs(rng.rand(1, d, s, s)).astype(np.float32)
    img_good = xlfm_forward_project(jnp.asarray(vol), otf, full_hw,
                                    psf_hw=(p, p))
    img_bad = np.asarray(img_good).copy()
    img_bad[0, 0, 3, 3] = np.nan
    img_ab = jnp.concatenate([jnp.asarray(img_bad), img_good], axis=0)
    r_ab, _ = xlfm_deconvolve(otf, img_ab, n_iter=5, obj_hw=(s, s),
                              roi_depths=d, full_hw=full_hw)
    r_good, _ = xlfm_deconvolve(otf, img_good, n_iter=5, obj_hw=(s, s),
                                roi_depths=d, full_hw=full_hw)
    # frozen frame stays at the (ROI-masked) ones init
    np.testing.assert_array_equal(np.asarray(r_ab[0]),
                                  np.ones((d, s, s), np.float32))
    np.testing.assert_allclose(np.asarray(r_ab[1:]), np.asarray(r_good),
                               rtol=1e-6, atol=1e-7)
