"""Batched FFT convolution for the XLFM image-formation model.

Reference: utils.py:449-550 (roll_n/batch_fftshift2d_real, fft_conv,
fft_conv_split) and utils.py:593-627 (load_PSF_OTF).

The reference chunks depth FFTs to bound GPU memory (n_split_fourier).  A v5e
chip holds all 96 depth planes of the padded rFFT comfortably, so the default
here is one batched rfft2 over the whole depth axis, with an optional
``depth_chunk`` (lax.map over chunks) as the memory-safety fallback — same
semantics, different schedule.

Convention: volumes are (B, D, S, S); PSFs (1, D, P, P); the padded FFT size
is fullSize = S + P per spatial dim (linear convolution support), and the
reference's ``batch_fftshift2d_real`` (roll by n//2, +1 when odd) recenters
the result.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Platforms whose runtime cannot execute the FFT HLO — or ANY complex64
# arithmetic (both fail with runtime UNIMPLEMENTED on axon; the compile
# succeeds, and a failed execution can wedge the device stream, so
# capability cannot be probed safely at runtime).  Dispatch is by
# platform name, overridable with CWFA_FFT_IMPL={gemm,xla}.  On these
# platforms spectra are carried as SpecPair (re, im) f32 pairs and
# transforms run as MXU matmul stages (ops.gemm_fft).
_FFT_UNIMPLEMENTED = {"axon"}


def backend_has_fft(platform: str | None = None) -> bool:
    """Whether the active backend can execute FFT + complex64 HLOs."""
    import os
    forced = os.environ.get("CWFA_FFT_IMPL", "").lower()
    if forced == "gemm":
        return False
    if forced == "xla":
        return True
    if platform is None:
        platform = jax.default_backend()
    if platform in _FFT_UNIMPLEMENTED:
        return False
    if platform == "tpu":
        # the axon dev tunnel registers its platform as plain "tpu";
        # identify it via the platform config / PJRT version string
        if "axon" in (jax.config.jax_platforms or ""):
            return False
        ver = getattr(jax.devices()[0].client, "platform_version", "")
        if "axon" in ver:
            return False
    return True


class SpecPair(NamedTuple):
    """A complex spectrum as separate (re, im) f32 arrays — the carrier
    type on backends without complex64 support.  Registered as a pytree
    (NamedTuple), so it flows through jit/shard_map like an array."""
    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def nbytes(self):
        return self.re.nbytes + self.im.nbytes


def rfft2(x: jax.Array):
    """rfft2 over the trailing two dims: the XLA FFT op (complex64 out)
    on capable backends, else matmul stages returning a SpecPair."""
    if backend_has_fft():
        return jnp.fft.rfft2(x)
    from cwfa_tpu.ops.gemm_fft import rfft2_gemm_pair
    return SpecPair(*rfft2_gemm_pair(x))


def rfft2_padded(x: jax.Array, full_hw):
    """``rfft2(_pad_center(x, full_hw))``, the physics layer's universal
    forward-transform shape.  On the matmul-DFT path the pad is never
    materialized and the stage-1 GEMMs contract only the window's rows
    (gemm_fft windowed-input transform — the object window is 600^2 of a
    2880^2 canvas at reference CLI scale, ~17x fewer stage-1 MACs and
    ~1 GB/slab less traffic); on FFT-capable backends this is exactly the
    padded ``jnp.fft.rfft2``."""
    x = x.astype(jnp.float32)
    if backend_has_fft():
        return jnp.fft.rfft2(_pad_center(x, full_hw))
    from cwfa_tpu.ops.gemm_fft import rfft2_window_input_gemm_pair
    return SpecPair(*rfft2_window_input_gemm_pair(x, tuple(full_hw)))


def irfft2(spec, s) -> jax.Array:
    """irfft2 counterpart of :func:`rfft2` (s = trailing-dim sizes)."""
    if isinstance(spec, SpecPair):
        from cwfa_tpu.ops.gemm_fft import irfft2_gemm_pair
        return irfft2_gemm_pair(spec.re, spec.im, tuple(s))
    return jnp.fft.irfft2(spec, s=s)


def spec_mul(a, b):
    """Elementwise spectral product (broadcasting), either carrier."""
    if isinstance(a, SpecPair) or isinstance(b, SpecPair):
        assert isinstance(a, SpecPair) and isinstance(b, SpecPair), (
            "mixed complex/SpecPair spectra: build every spectrum under "
            "the same CWFA_FFT_IMPL / backend")
        return SpecPair(a.re * b.re - a.im * b.im,
                        a.re * b.im + a.im * b.re)
    return a * b


def spec_conj(spec):
    if isinstance(spec, SpecPair):
        return SpecPair(spec.re, -spec.im)
    return jnp.conj(spec)


def fftshift2d_real(x: jax.Array) -> jax.Array:
    """Reference batch_fftshift2d_real (utils.py:465-477): roll every spatial
    dim (2:) by n//2 (+1 for odd sizes)."""
    for dim in range(2, x.ndim):
        n = x.shape[dim]
        shift = n // 2 + (n % 2)
        x = jnp.roll(x, shift, axis=dim)
    return x


def _pad_center(x: jax.Array, target_hw) -> jax.Array:
    """Symmetric floor/ceil zero-pad of the trailing two dims to target_hw
    (reference fft_conv padding, utils.py:492-498)."""
    pads = [(0, 0)] * (x.ndim - 2)
    for i, t in enumerate(target_hw):
        d = t - x.shape[x.ndim - 2 + i]
        pads.append((d // 2, d - d // 2))
    return jnp.pad(x, pads)


def fft_conv(a: jax.Array, b_fft: jax.Array, full_hw) -> jax.Array:
    """Convolution with a precomputed rFFT kernel: pad a to full_hw, multiply
    spectra, inverse transform, recenter (utils.py:480-510, B_precomputed
    branch)."""
    a_fft = rfft2_padded(a, full_hw)
    out = irfft2(spec_mul(a_fft, b_fft), s=full_hw)
    return fftshift2d_real(out)


def _next_smooth_same_parity(n: int) -> int:
    """Smallest integer >= n with the SAME PARITY as n whose prime factors
    are all in {2, 3, 5}.

    XLA's TPU FFT at sizes with a large prime factor falls off the
    mixed-radix fast path (the reference CLI's canvas 600 + 2160 = 2760 =
    2^3*3*5*23 exhausts HBM in the chirp-transform workspace at reference
    scale).  Growing the linear-convolution canvas is exact ONLY by an
    even amount: every offset downstream (the _pad_center floor-halves,
    the fftshift roll, the center crops) moves by exactly (m-n)/2 when
    n -> m with m ≡ n (mod 2), so the composed pad->conv->roll->crop
    index map is unchanged — whereas rounding an odd obj+psf canvas up to
    an even size shifts the recentered convolution by one pixel
    (regression-tested smooth-vs-exact).  Even canvases round 2760 ->
    2880 (+9%); odd ones land on the sparser 3^a*5^b grid (e.g. a 2161^2
    PSF with a 600^2 object: 2761 -> 3125, +13%)."""
    m = n
    while True:
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        if k == 1:
            return m
        m += 2


def precompute_otf(psf: jax.Array, obj_hw, *, smooth: bool = True,
                   depth_chunk: int = 24) -> tuple[jax.Array, tuple]:
    """OTF = rfft2 of the PSF zero-padded to fullSize = obj + psf
    (reference load_PSF_OTF via fft_conv's B branch, utils.py:503-510,617).

    psf: (1, D, P, P) with per-depth sum normalized.
    smooth: round the canvas up to a 5-smooth size of the same parity
    (TPU FFT fast path; exact — see _next_smooth_same_parity).
    smooth=False replays the reference's exact obj+psf canvas
    (odd-width parity tests).
    depth_chunk: PSF depths transformed per FFT call — bounds the rfft2
    workspace (~8 GB for 120 planes of 2880^2 in one call).
    Returns (OTF complex64 (1, D, F0, F1//2+1), full_hw).
    """
    p_hw = psf.shape[-2:]
    full_hw = (obj_hw[0] + p_hw[0], obj_hw[1] + p_hw[1])
    if smooth:
        full_hw = (_next_smooth_same_parity(full_hw[0]),
                   _next_smooth_same_parity(full_hw[1]))
    d = psf.shape[1]
    outs = []
    for j in range(0, d, depth_chunk):
        slab = psf[:, j:j + depth_chunk]
        outs.append(rfft2_padded(slab, full_hw))
    if len(outs) == 1:
        return outs[0], full_hw
    cat = lambda *leaves: jnp.concatenate(leaves, axis=1)
    return jax.tree.map(cat, *outs), full_hw


def _project_chunk(vol_chunk, otf_chunk, full_hw):
    vol_fft = rfft2_padded(vol_chunk, full_hw)
    img = irfft2(spec_mul(vol_fft, otf_chunk), s=full_hw)
    img = fftshift2d_real(img)
    return jax.nn.relu(img).sum(axis=1, keepdims=True)


def xlfm_forward_project(vol: jax.Array, otf: jax.Array, full_hw,
                         psf_hw=None, depth_chunk: int | None = None):
    """Image formation: sum over depths of PSF-convolved planes
    (reference fft_conv_split, utils.py:513-550; XLFMDeconv forward pass,
    utils.py:694-700).

    vol: (B, D, S, S) non-padded object volume.
    Returns (B, 1, psf_hw) when psf_hw is given (center crop), else the
    padded (B, 1, full_hw) image.
    """
    vol = vol.astype(jnp.float32)
    d = vol.shape[1]
    if depth_chunk is None or depth_chunk >= d:
        img = _project_chunk(vol, otf, full_hw)
    else:
        n_chunks = int(np.ceil(d / depth_chunk))
        pad_d = n_chunks * depth_chunk - d
        vol_c = jnp.pad(vol, [(0, 0), (0, pad_d), (0, 0), (0, 0)])
        otf_c = jax.tree.map(
            lambda o: jnp.moveaxis(
                jnp.pad(o, [(0, 0), (0, pad_d), (0, 0), (0, 0)])
                .reshape(1, n_chunks, depth_chunk, *o.shape[-2:]), 1, 0),
            otf)
        vol_c = vol_c.reshape(vol.shape[0], n_chunks, depth_chunk,
                              *vol.shape[-2:])
        imgs = jax.lax.map(
            lambda args: _project_chunk(args[0], args[1], full_hw),
            (jnp.moveaxis(vol_c, 1, 0), otf_c))
        img = imgs.sum(axis=0)
    if psf_hw is not None:
        h0 = (full_hw[0] - psf_hw[0]) // 2
        w0 = (full_hw[1] - psf_hw[1]) // 2
        img = img[:, :, h0:h0 + psf_hw[0], w0:w0 + psf_hw[1]]
    return img
