"""FFT as MXU matmul stages (four-step Cooley–Tukey) for backends
without an FFT lowering.

The axon TPU backend rejects every ``jnp.fft`` call with UNIMPLEMENTED
(the FFT HLO has no lowering on it), so the physics layer's FFT
convolutions (reference utils.py:480-550) cannot run on the chip through
XLA's op.  The TPU-native fallback is the classic expression of a DFT as
matmul stages, which puts the butterflies on the MXU:

  N = A*B,  input index n = a*B + b,  output index k = k1 + A*k2:
  X[k1 + A*k2] = DFT_B_{b->k2}( W_N^{k1*b} * DFT_A_{a->k1}(x[a*B + b]) )

with A the largest divisor of N <= 128 (the MXU contraction width), so
the dominant stage is a K=A GEMM over all rows.  Complex values are
carried as separate (re, im) f32 planes; matmuls run at an explicit
precision (default HIGHEST — DFT matrices are dense rotations, and this
JAX build truncates matmul inputs to bf16 at DEFAULT precision, which
costs ~3 significant digits on a length-2880 transform).

Canvas sizes from ops.fft_conv._next_smooth_same_parity are 5-smooth
(even canvases by far the common case; odd obj+psf sums stay odd for
exactness and factor as 3^a*5^b), so a usable divisor A <= 128 always
exists at physics scales.  These functions are
shape-generic and oracle-tested against numpy's FFT; on backends with a
real FFT lowering prefer jnp.fft (fft_conv.rfft2/irfft2 dispatch on
fft_conv.backend_has_fft).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _default_precision():
    """Matmul precision for the DFT stages: CWFA_GEMM_FFT_PRECISION in
    {highest (default — f32-grade, multi-pass bf16), high, default
    (single-pass bf16: ~3 significant digits at N=2880, fine for
    previews, not for parity)}."""
    import os
    name = os.environ.get("CWFA_GEMM_FFT_PRECISION", "highest").lower()
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[name]


def _dense_enabled() -> bool:
    """Kill switch for the dense minor-axis window stages (A/B rigs):
    CWFA_GEMM_FFT_DENSE=0 forces the four-step form everywhere."""
    import os
    return os.environ.get("CWFA_GEMM_FFT_DENSE", "1") != "0"


def _best_factor(n: int) -> int:
    """Largest divisor of n that is <= 128 (A of the four-step split).

    CWFA_GEMM_FFT_FACTOR overrides the pick for A/B sweeps (used only
    when it divides n and fits the MXU contraction width).  The n=2880
    sweep at reference RL scale (v5e, bench_gemm_fft_forms --shipped)
    confirmed the default: A=120 fwd 26.5 / inv 21.3 ms/slab; A=72 ties
    within noise (26.4/21.1); every other divisor in [48, 96] is 2-50%
    worse (A=60/90 inverse chains degrade ~50%)."""
    import os
    ov = os.environ.get("CWFA_GEMM_FFT_FACTOR")
    if ov:
        a = int(ov)
        if 1 < a <= 128 and n % a == 0:
            return a
    best = 1
    for a in range(2, min(n, 128) + 1):
        if n % a == 0:
            best = a
    return best


@lru_cache(maxsize=64)
def _dft_mats(n: int, inverse: bool):
    """DFT matrix F[k, a] = exp(-+2j*pi*k*a/n) as (re, im) f32 pair."""
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    sign = 1.0 if inverse else -1.0
    return (np.cos(ang).astype(np.float32),
            (sign * np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=64)
def _stage1_mats(n: int, a: int, inverse: bool):
    """Stage-1 DFT matrix with the four-step twiddle FOLDED IN:
    W1[k1, a', b] = exp(-+2j*pi*(k1*a'/A + k1*b/N)).

    A separate twiddle pass costs a full read+write of the (..., A, B)
    intermediate (HBM-bound at canvas scale: ~4 GB per slab transform);
    folding it makes stage 1 a per-b batched GEMM with the same K=A
    contraction and zero extra traffic."""
    b = n // a
    k1 = np.arange(a)[:, None, None]
    ang = 2.0 * np.pi * (k1 * np.arange(a)[None, :, None] / a
                         + k1 * np.arange(b)[None, None, :] / n)
    sign = 1.0 if inverse else -1.0
    return (np.cos(ang).astype(np.float32),
            (sign * np.sin(ang)).astype(np.float32))


def _karatsuba_enabled() -> bool:
    """Gauss 3-multiplication complex GEMMs (CWFA_GEMM_FFT_KARATSUBA,
    read at trace time).  re = FrXr - FiXi is unchanged; im is computed
    as (Fr+Fi)(xr+xi) - FrXr - FiXi — 3 dots instead of 4 (the F-side
    sum is a constant XLA folds; the x-side sum is one VPU pass).  The
    im part picks up cancellation roundoff ~eps*|t3| instead of
    eps*(|FrXi|+|FiXr|) — same error class, slightly larger constant
    (oracle error stays at f32 roundoff).

    Measured SLOWER on the shipped RL chains (v5e, reference CLI
    shapes, scripts/bench_gemm_fft_forms.py --shipped): fwd 26.5 ->
    29.7, inv 21.3 -> 25.8 ms/slab — the extra (xr+xi) intermediate and
    the lost operand sharing between dot(fr,·)/dot(fi,·) pairs outweigh
    the 25% MAC cut on these traffic-heavy stages.  Default OFF; the
    flag stays as the A/B rig."""
    import os
    return os.environ.get("CWFA_GEMM_FFT_KARATSUBA", "0") == "1"


def _cmatmul(fr, fi, xr, xi, spec, precision):
    """Complex contraction einsum(spec, F, x): (Fr + iFi)(xr + ixi)."""
    dot = partial(jnp.einsum, spec, precision=precision)
    if xi is None:                       # real input: 2 matmuls
        return dot(fr, xr), dot(fi, xr)
    if _karatsuba_enabled():
        t1, t2 = dot(fr, xr), dot(fi, xi)
        t3 = dot(fr + fi, xr + xi)
        return t1 - t2, t3 - t1 - t2
    return (dot(fr, xr) - dot(fi, xi),
            dot(fr, xi) + dot(fi, xr))


def fft_last(xr, xi, *, inverse: bool = False, precision=None,
             out_len: int | None = None):
    """1-D complex DFT over the LAST axis via the four-step split.

    xr/xi: (..., N) f32; xi=None for real input.  Returns (yr, yi); the
    inverse applies no 1/N scaling (the rfft2/irfft2 pair scales once).
    out_len: compute only the first out_len output bins (rounded up to a
    multiple of A internally) — the rfft keeps N/2+1 bins, so stage 2
    skips ~half its columns.
    """
    if precision is None:
        precision = _default_precision()
    n = xr.shape[-1]
    a = _best_factor(n)
    b = n // a
    if b == 1:                           # single dense DFT matmul
        fr, fi = map(jnp.asarray, _dft_mats(n, inverse))
        yr, yi = _cmatmul(fr, fi, xr, xi, "ka,...a->...k", precision)
        if out_len is not None:
            yr, yi = yr[..., :out_len], yi[..., :out_len]
        return yr, yi
    xr = xr.reshape(xr.shape[:-1] + (a, b))
    xi = None if xi is None else xi.reshape(xi.shape[:-1] + (a, b))
    # stage 1 (twiddle folded in): per-b batched K=A GEMM
    w1r, w1i = map(jnp.asarray, _stage1_mats(n, a, inverse))
    yr, yi = _cmatmul(w1r, w1i, xr, xi, "kab,...ab->...kb", precision)
    # stage 2: K=B GEMM; the einsum output order (..., k2, k1) IS the
    # flat-index order k = k1 + A*k2, so no transpose pass is needed
    fbr, fbi = map(jnp.asarray, _dft_mats(b, inverse))
    keep = b if out_len is None else min(-(-out_len // a), b)
    zr, zi = _cmatmul(fbr[:keep], fbi[:keep], yr, yi,
                      "cb,...kb->...ck", precision)
    out_shape = zr.shape[:-2] + (keep * a,)
    zr, zi = zr.reshape(out_shape), zi.reshape(out_shape)
    if out_len is not None and out_len != keep * a:
        zr, zi = zr[..., :out_len], zi[..., :out_len]
    return zr, zi


def _fft_axis(xr, xi, axis: int, **kw):
    xr = jnp.moveaxis(xr, axis, -1)
    xi = None if xi is None else jnp.moveaxis(xi, axis, -1)
    yr, yi = fft_last(xr, xi, **kw)
    return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)


def rfft2_gemm_pair(x, precision=None):
    """jnp.fft.rfft2 equivalent on (..., H, W) real input -> (re, im) f32
    pair of shape (..., H, W//2 + 1), via matmul DFT stages.  Never
    touches a complex dtype (unsupported on the axon runtime)."""
    w = x.shape[-1]
    yr, yi = fft_last(x, None, precision=precision, out_len=w // 2 + 1)
    return _fft_axis(yr, yi, -2, precision=precision)


def rfft2_gemm(x, precision=None):
    """Complex-dtype convenience wrapper (oracle tests on CPU)."""
    return jax.lax.complex(*rfft2_gemm_pair(x, precision))


@lru_cache(maxsize=64)
def _hermitian_ck_np(wr: int, w: int):
    ck = np.full(wr, 2.0, np.float32)
    ck[0] = 1.0
    if w % 2 == 0:
        ck[wr - 1] = 1.0
    return ck


def _hermitian_ck(wr: int, w: int):
    """Hermitian real-output fold weights over the rfft bins:
    out[m] = Re(sum_k c_k X_k W^{+mk}) with c_k = 2 except DC (and the
    Nyquist bin for even W).  Shared by both inverse paths so the fold
    semantics can never diverge.  Only the NUMPY weights are lru_cached —
    caching the jnp array leaked a tracer when the first call for a given
    (wr, w) happened inside a traced scope (lax.map in the depth-chunked
    projection) and poisoned every later call (UnexpectedTracerError)."""
    return jnp.asarray(_hermitian_ck_np(wr, w))


def irfft2_gemm_pair(xr, xi, s, precision=None):
    """jnp.fft.irfft2 equivalent on an (re, im) pair (..., H, W//2+1) ->
    real (..., H, W) with W = s[1]; no complex dtypes."""
    h, w = s
    wr = w // 2 + 1
    assert xr.shape[-1] == wr, (xr.shape, s)
    assert xr.shape[-2] == h, (xr.shape, s)
    xr, xi = _fft_axis(xr, xi, -2, inverse=True, precision=precision)
    # fold the real-output Hermitian symmetry into the W stage instead of
    # materializing the conjugate tail (see irfft2_window_gemm_pair):
    # out[m] = Re(sum_k c_k X_k W^{+mk}) over just the rfft bins,
    # c_k = 2 except DC (and Nyquist for even W); the full inverse is the
    # windowed inverse evaluated at [0, W)
    ck = _hermitian_ck(wr, w)
    yr, _ = idft_window_last(xr * ck, xi * ck, 0, w, real_out=True,
                             precision=precision, n=w)
    return yr / (h * w)


def irfft2_gemm(spec, s, precision=None):
    """Complex-dtype convenience wrapper (oracle tests on CPU)."""
    return irfft2_gemm_pair(jnp.real(spec), jnp.imag(spec), s, precision)


# ---------------------------------------------------------------------------
# Windowed input: transform a signal known to be zero outside a window.
#
# The RL forward projection transforms the object volume zero-padded from
# (600, 600) into the (2880, 2880) canvas, and the ratio zero-padded from
# the (2160, 2160) camera support (deconv.py): the DFT sum only receives
# contributions from the window, so the stage-1 contraction shrinks from
# K=A to the ~window/B rows that overlap it AND the padded canvas (~1 GB
# per slab) is never materialized.  Exact — oracle-tested against
# pad + full transform.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _stage1_window_mats(n: int, a: int, a0: int, rows: int):
    """Stage-1 matrices (twiddle folded, see _stage1_mats) sliced to the
    absolute input rows a' = a0 .. a0+rows-1 of the (A, B) input split:
    W1[k1, r, b] = exp(-2j*pi*(k1*(a0+r)/A + k1*b/N))."""
    b = n // a
    k1 = np.arange(a)[:, None, None]
    aa = (a0 + np.arange(rows))[None, :, None]
    ang = 2.0 * np.pi * (k1 * aa / a + k1 * np.arange(b)[None, None, :] / n)
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=64)
def _dense_window_fwd_mats(n: int, i0: int, il: int, out_len: int):
    """Single-GEMM windowed forward DFT matrix
    F[k, j] = exp(-2j*pi*k*(i0+j)/n), k < out_len, j < il."""
    k = np.arange(out_len)[:, None]
    j = i0 + np.arange(il)[None, :]
    ang = 2.0 * np.pi * k * j / n
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def fft_last_window(xr, xi, i0: int, n: int, *, out_len: int | None = None,
                    precision=None, dense: bool | None = None):
    """Forward DFT over the LAST axis of a length-``n`` signal that is zero
    outside ``[i0, i0+il)``, given only the window (``il = xr.shape[-1]``).

    Same output as ``fft_last`` on the zero-padded signal; the stage-1
    GEMM contracts only the ~il/B input rows overlapping the window and
    the pad is never materialized.  xi=None for real input; out_len as in
    :func:`fft_last`.

    dense: emit ONE (out_len x il) GEMM instead of the two four-step
    stages.  ~6x the MACs at reference deconv scale, yet measured FASTER
    on the input's MINOR axis for real input (29.3 -> 26.7 ms per
    30-depth slab of the 600-in-2880 RL object transform on v5e: full
    128-wide MXU tiles and no (A, B) reshape/relayout passes beat the
    MAC count; the same dense form on the moved-from-H axis LOSES,
    32.5 vs 29.3 — scripts/bench_gemm_fft_forms.py).  Default (None):
    dense exactly for that measured winner — real input on a window
    <= n/2 (the wide-window guard below already owns the rest) — unless
    CWFA_GEMM_FFT_DENSE=0.
    """
    if precision is None:
        precision = _default_precision()
    il = xr.shape[-1]
    assert 0 <= i0 and i0 + il <= n, (i0, il, n)
    if dense is None:
        dense = xi is None and 2 * il <= n and _dense_enabled()
    if dense:
        out = n if out_len is None else out_len
        fr, fi = map(jnp.asarray, _dense_window_fwd_mats(n, i0, il, out))
        return _cmatmul(fr, fi, xr, xi, "ka,...a->...k", precision)
    if 2 * il > n:
        # wide windows don't pay: stage-1 K-pruning buys no MXU time
        # (K < 128 pads to one pass either way) and the aligned-window
        # pad/reshape costs relayouts — measured on the 2160-in-2880 PSF
        # precompute (42 s vs 22 s warm).  The win is row pruning, which
        # needs a genuinely small window; zero-pad and transform fully.
        pads = [(0, 0)] * (xr.ndim - 1) + [(i0, n - i0 - il)]
        return fft_last(jnp.pad(xr, pads),
                        None if xi is None else jnp.pad(xi, pads),
                        out_len=out_len, precision=precision)
    a = _best_factor(n)
    b = n // a
    if b == 1:                           # dense DFT, window-sliced columns
        fr, fi = _dft_mats(n, False)
        fr = jnp.asarray(fr[:, i0:i0 + il])
        fi = jnp.asarray(fi[:, i0:i0 + il])
        yr, yi = _cmatmul(fr, fi, xr, xi, "ka,...a->...k", precision)
        if out_len is not None:
            yr, yi = yr[..., :out_len], yi[..., :out_len]
        return yr, yi
    # align the window to the B-grid of the (A, B) input split
    a0 = i0 // b
    lead = i0 - a0 * b
    rows = -(-(lead + il) // b)
    pads = [(0, 0)] * (xr.ndim - 1) + [(lead, rows * b - lead - il)]
    xr = jnp.pad(xr, pads).reshape(xr.shape[:-1] + (rows, b))
    xi = None if xi is None else (
        jnp.pad(xi, pads).reshape(xi.shape[:-1] + (rows, b)))
    w1r, w1i = map(jnp.asarray, _stage1_window_mats(n, a, a0, rows))
    yr, yi = _cmatmul(w1r, w1i, xr, xi, "krb,...rb->...kb", precision)
    # stage 2 identical to fft_last: K=B GEMM, flat-order (..., k2, k1) out
    fbr, fbi = map(jnp.asarray, _dft_mats(b, False))
    keep = b if out_len is None else min(-(-out_len // a), b)
    zr, zi = _cmatmul(fbr[:keep], fbi[:keep], yr, yi,
                      "cb,...kb->...ck", precision)
    out_shape = zr.shape[:-2] + (keep * a,)
    zr, zi = zr.reshape(out_shape), zi.reshape(out_shape)
    if out_len is not None and out_len != keep * a:
        zr, zi = zr[..., :out_len], zi[..., :out_len]
    return zr, zi


def rfft2_window_input_gemm_pair(x, s, h0: int | None = None,
                                 w0: int | None = None, precision=None):
    """``rfft2`` of ``x`` zero-padded into canvas ``s`` with its top-left
    at ``(h0, w0)`` (default: centered, the ``_pad_center`` convention),
    computed without materializing the padded canvas: the W pass runs only
    on x's nonzero rows, and both passes contract only the window's
    stage-1 rows.  Returns an (re, im) pair of shape (..., H, W//2+1)."""
    h, w = s
    hi, wi = x.shape[-2:]
    if h0 is None:
        h0 = (h - hi) // 2
    if w0 is None:
        w0 = (w - wi) // 2
    yr, yi = fft_last_window(x, None, w0, w, out_len=w // 2 + 1,
                             precision=precision)
    yr, yi = jnp.moveaxis(yr, -2, -1), jnp.moveaxis(yi, -2, -1)
    zr, zi = fft_last_window(yr, yi, h0, h, precision=precision)
    return jnp.moveaxis(zr, -1, -2), jnp.moveaxis(zi, -1, -2)


# ---------------------------------------------------------------------------
# Windowed inverse: evaluate only an output window of the inverse DFT.
#
# The RL back-projection reads ONLY the (600, 600) object window of each
# (2880, 2880) correction plane (deconv.py crop-before-multiply), and the
# DFT exponential W_N^{-mk} accepts ANY integer output index m, so the
# fftshift-roll + crop composition folds into the evaluation points: cost
# scales with the window, not the canvas (~3x fewer MACs and ~5x less
# write traffic on the dominant deconv segment).  Exact — oracle-tested
# against full-inverse + shift + crop.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _idft_window_mats(n: int, a: int, w0a: int, rows: int):
    """Windowed-inverse stage matrices for output indices
    m = w0a + p*B + m2 (p < rows, m2 < B, B = n/a):

      stage 1: Fb[m2, k2] = exp(+2j*pi*m2*k2/B)        (K=B GEMM)
      stage 2: W2[p, k1, m2] = exp(+2j*pi*(w0a + p*B + m2)*k1/n)

    derived from out[m] = sum_k1 W_n^{-m k1} sum_k2 X[k1+A*k2] W_B^{-m k2}
    (only m mod B enters the inner sum)."""
    b = n // a
    m2 = np.arange(b)
    ang1 = 2.0 * np.pi * np.outer(m2, np.arange(b)) / b
    m = (w0a + np.arange(rows)[:, None, None] * b
         + m2[None, None, :])                        # (rows, 1, B)
    ang2 = 2.0 * np.pi * m * np.arange(a)[None, :, None] / n
    return (np.cos(ang1).astype(np.float32), np.sin(ang1).astype(np.float32),
            np.cos(ang2).astype(np.float32), np.sin(ang2).astype(np.float32))


@lru_cache(maxsize=64)
def _dense_idft_window_mats(n: int, w0: int, wl: int, nb: int):
    """Single-GEMM windowed inverse DFT matrix
    F[m, k] = exp(+2j*pi*(w0+m)*k/n), m < wl, over the nb leading bins."""
    m = np.arange(w0, w0 + wl)[:, None]
    k = np.arange(nb)[None, :]
    ang = 2.0 * np.pi * m * k / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def idft_window_last(xr, xi, w0: int, wl: int, *, real_out: bool = False,
                     precision=None, n: int | None = None,
                     dense: bool | None = None):
    """Unscaled inverse DFT over the last axis, evaluated ONLY at output
    indices [w0, w0+wl) (any integers — the kernel is N-periodic, so a
    pre-roll crop window is expressed by passing its unrolled start).

    xr/xi: complex spectrum as (re, im), full N bins on the last axis —
    or, with ``n`` given, only the LEADING bins of a length-``n``
    transform whose tail is zero (the Hermitian-fold form: callers scale
    the rfft bins by c_k and drop the conjugate tail — see
    irfft2_window_gemm_pair).  Bins zero-pad up to whole k2 blocks and
    stage 1 contracts only those blocks (~half the K for rfft bins).
    real_out: return just the real part (2 matmuls in stage 2).
    dense: ONE (wl x nb) GEMM instead of the two four-step stages —
    measured FASTER for the real-output minor-axis stage at reference
    deconv scale (24.9 -> 21.3 ms per 30-depth slab of the 600-of-2880
    windowed RL back-projection on v5e; the moved-from-H complex stage
    LOSES, 29.1 vs 24.9 — scripts/bench_gemm_fft_forms.py).  Default
    (None): dense exactly for that winner — real_out on a window
    <= n/2 — unless CWFA_GEMM_FFT_DENSE=0.
    """
    if precision is None:
        precision = _default_precision()
    nb = xr.shape[-1]
    if n is None:
        n = nb
    assert nb <= n, (nb, n)
    if dense is None:
        dense = real_out and 2 * wl <= n and _dense_enabled()
    if dense:
        fr, fi = map(jnp.asarray, _dense_idft_window_mats(n, w0, wl, nb))
        dot = partial(jnp.einsum, "mk,...k->...m", precision=precision)
        yr = dot(fr, xr) - dot(fi, xi)
        yi = None if real_out else dot(fr, xi) + dot(fi, xr)
        return yr, yi
    a = _best_factor(n)
    b = n // a
    bk = -(-nb // a)                    # k2 blocks holding nonzero bins
    if bk * a != nb:
        pads = [(0, 0)] * (xr.ndim - 1) + [(0, bk * a - nb)]
        xr, xi = jnp.pad(xr, pads), jnp.pad(xi, pads)
    w0a = (w0 // b) * b                 # align the window start to B
    rows = -(-(w0 + wl - w0a) // b)
    f1r, f1i, f2r, f2i = map(jnp.asarray,
                             _idft_window_mats(n, a, w0a, rows))
    if bk != b:
        f1r, f1i = f1r[:, :bk], f1i[:, :bk]
    # flat k = k1 + A*k2 is k2-major: reshape to (..., k2, k1)
    xr = xr.reshape(xr.shape[:-1] + (bk, a))
    xi = xi.reshape(xi.shape[:-1] + (bk, a))
    ir, ii = _cmatmul(f1r, f1i, xr, xi, "mc,...ca->...ma", precision)
    dot = partial(jnp.einsum, "pam,...ma->...pm", precision=precision)
    if real_out:
        yr, yi = dot(f2r, ir) - dot(f2i, ii), None
    else:
        yr, yi = _cmatmul(f2r, f2i, ir, ii, "pam,...ma->...pm", precision)
    out_shape = yr.shape[:-2] + (rows * b,)
    sl = slice(w0 - w0a, w0 - w0a + wl)
    yr = yr.reshape(out_shape)[..., sl]
    yi = None if yi is None else yi.reshape(out_shape)[..., sl]
    return yr, yi


def irfft2_window_gemm_pair(xr, xi, s, h_win, w_win, precision=None,
                            pack_depth: bool = False):
    """The (h_win, w_win) window of ``fftshift2d_real(irfft2(spec, s))``
    without materializing the full canvas: h_win/w_win are (start, length)
    in POST-fftshift coordinates (the deconv convention: roll by n//2 +
    (n odd), then crop).

    pack_depth: with an even-length axis at -3 (the depth slab), pack
    plane pairs (2d, 2d+1) as the (re, im) halves of ONE complex W-stage
    transform — each windowed inverse is real, so the complex inverse of
    Z = E_2d + i*E_2d+1 carries both planes exactly; the W-stage-1
    transform count halves (f32-rounding-level differences only, not
    bit-identical to the unpacked path)."""
    h, w = s
    wr = w // 2 + 1
    assert xr.shape[-1] == wr and xr.shape[-2] == h, (xr.shape, s)
    (h0, hl), (w0, wl) = h_win, w_win
    # post-shift index i reads unshifted index i - shift (mod n)
    h0u = h0 - (h // 2 + h % 2)
    w0u = w0 - (w // 2 + w % 2)
    # H axis first (complex out, only hl rows survive to the W stage)
    yr, yi = jnp.moveaxis(xr, -2, -1), jnp.moveaxis(xi, -2, -1)
    yr, yi = idft_window_last(yr, yi, h0u, hl, precision=precision)
    yr, yi = jnp.moveaxis(yr, -1, -2), jnp.moveaxis(yi, -1, -2)
    if pack_depth and xr.ndim >= 3 and xr.shape[-3] % 2 == 0:
        # the packed complex inverse needs the full spectrum: Hermitian-
        # extend the W bins (on hl rows only) before pairing planes
        t = slice(1, w - wr + 1)
        yr = jnp.concatenate([yr, yr[..., t][..., ::-1]], axis=-1)
        yi = jnp.concatenate([yi, -yi[..., t][..., ::-1]], axis=-1)
        zr = yr[..., 0::2, :, :] - yi[..., 1::2, :, :]
        zi = yi[..., 0::2, :, :] + yr[..., 1::2, :, :]
        er, ei = idft_window_last(zr, zi, w0u, wl, real_out=False,
                                  precision=precision)
        out = jnp.stack([er, ei], axis=-3)
        out = out.reshape(out.shape[:-4] + (xr.shape[-3], hl, wl))
        return out / (h * w)
    # fold the real-output Hermitian symmetry into the W stage instead of
    # materializing the conjugate tail: out[m] = Re(sum_k c_k X_k W^{+mk})
    # over just the rfft bins, c_k = 2 except DC (and Nyquist for even W).
    # Exact for spectra of real data — DC/Nyquist imaginary parts are f32
    # roundoff and the real part discards them either way.  Stage 1 then
    # contracts ~half the k2 blocks and the (..., hl, W) extension copy
    # never exists (measured on the RL backward projection:
    # docs/PERFORMANCE.md round-3, Hermitian fold).
    ck = _hermitian_ck(wr, w)
    out, _ = idft_window_last(yr * ck, yi * ck, w0u, wl, real_out=True,
                              precision=precision, n=w)
    return out / (h * w)
