"""Richardson–Lucy XLFM deconvolution as a jitted TPU loop.

Reference: utils.py:630-738 (XLFMDeconv).  Per iteration:

  ImgEst  = sum_d relu(fftshift(irfft2(rfft2(pad(Obj)) * OTF)))
  Ratio   = clamp(ImgExp / (ImgEst + 1e-8), 0, median_nonzero(Ratio) * mult)
  Obj     = crop( pad(Obj) * fftshift(irfft2(rfft2(Ratio) * conj(OTF))) )

and finally depths outside the ROI are zeroed (utils.py:736-737).

TPU design: the whole loop is one ``lax.fori_loop`` inside ``jax.jit``; the
per-depth FFTs run as one batched rfft2 over the depth axis (optionally
chunked via ``depth_chunk`` — the n_split_fourier analogue) and the depth
reduction is a single sum, which XLA turns into a ``psum`` over the mesh when
the depth axis is sharded (SURVEY.md §5.7).  With ``fourier_sum`` (default)
the forward projection's depth reduction happens in the FOURIER domain, so
one single-plane inverse transform replaces one per depth slab (exact by
linearity; the per-depth relu it commutes past only clips FFT roundoff — see
``xlfm_deconvolve``).  The reference's NaN early-abort (utils.py:707-709)
becomes a NaN-freeze: once NaN appears the state stops updating, preserving
restartability without host round-trips per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cwfa_tpu.ops.fft_conv import (SpecPair, fftshift2d_real, _pad_center,
                                   rfft2, rfft2_padded, irfft2, spec_mul,
                                   spec_conj)


def _pack_inverse_pairs() -> bool:
    """Depth-pair packing of the windowed inverse transforms on the
    matmul-DFT path (gemm_fft.irfft2_window_gemm_pair pack_depth).
    Measured SLOWER at reference CLI scale (477.8 vs 446.6 ms/iter on
    v5e: the strided depth split/interleave relayouts exceed the halved
    stage-1 transform count) — default off; CWFA_DECONV_PACK=1 enables
    (read at trace time)."""
    import os
    return os.environ.get("CWFA_DECONV_PACK", "0") == "1"


def _median_nonzero_sort(x: jax.Array) -> jax.Array:
    """torch ``t[t!=0].median()`` — lower-middle element of the sorted nonzero
    values (index (n-1)//2).  The direct (full-sort) form: the oracle for
    :func:`_median_nonzero` and the dispatch for weird dtypes."""
    flat = x.reshape(-1)
    nz = flat != 0
    cnt = jnp.sum(nz)
    big = jnp.where(nz, flat, jnp.inf)
    srt = jnp.sort(big)
    idx = jnp.maximum(cnt - 1, 0) // 2
    return jnp.where(cnt > 0, srt[idx], 0.0)


def _median_nonzero_batch(x: jax.Array) -> jax.Array:
    """Per-sample torch ``t[t!=0].median()`` over the leading batch axis
    — shape (B, ...) -> (B,) — as a 32-step binary search over the
    order-preserving u32 transform of the f32 bits instead of a full sort
    (XLA's sort is O(n log^2 n) comparator passes — measured 21 ms/iter
    on the 4.7M-element RL ratio at reference CLI scale; 32 fused
    compare-and-count reductions are ~10x cheaper).  Per-sample because
    batched deconvolution must match B independent reference runs: the
    RL ratio clamp (utils.py:701-703) is a per-frame statistic.

    The classic radix transform (negative: ~bits, else bits|0x8000_0000)
    is strictly monotonic over all floats, so the k-th smallest ELEMENT
    (k = (n-1)//2, the sort's lower-middle) is recovered exactly: descend
    the bits keeping the largest prefix p with count(t < p) <= k.
    Nonzero filtering maps zeros to the all-ones pattern (above every
    transformed float except the max-payload NaN, which only arises when
    the NaN-freeze is about to discard the update anyway).  Equivalence
    vs the sort form is tested (duplicates/negatives/zeros/even/odd)."""
    b = x.shape[0]
    if x.dtype != jnp.float32:
        return jax.vmap(_median_nonzero_sort)(x.reshape(b, -1))
    flat = x.reshape(b, -1)
    nz = flat != 0
    cnt = jnp.sum(nz, axis=1)
    k = jnp.maximum(cnt - 1, 0) // 2          # rank of the lower middle
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    neg = bits >> 31
    t = jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))
    t = jnp.where(nz, t, jnp.uint32(0xFFFFFFFF))

    def step(i, p):
        cand = p | (jnp.uint32(1) << (31 - i))
        # k-th smallest >= cand iff fewer than k+1 values lie below it
        below = jnp.sum(t < cand[:, None], axis=1)
        return jnp.where(below <= k, cand, p)

    p = jax.lax.fori_loop(0, 32, step, jnp.zeros((b,), jnp.uint32))
    orig = jnp.where(p >> 31, p ^ jnp.uint32(0x80000000), ~p)
    val = jax.lax.bitcast_convert_type(orig, jnp.float32)
    return jnp.where(cnt > 0, val, 0.0)


def _median_nonzero(x: jax.Array) -> jax.Array:
    """Scalar form of :func:`_median_nonzero_batch` (whole-array median)."""
    return _median_nonzero_batch(x.reshape(1, -1))[0]


@partial(jax.jit, static_argnames=("n_iter", "obj_hw", "roi_depths",
                                   "depth_chunk",
                                   "update_median_limit_multiplier",
                                   "full_hw", "fourier_sum"))
def xlfm_deconvolve(otf: jax.Array, img: jax.Array, n_iter: int,
                    obj_hw=(512, 512), roi_depths: int = 90,
                    depth_chunk: int | None = None,
                    update_median_limit_multiplier: float = 10.0,
                    full_hw=None, init_obj=None, fourier_sum: bool = True):
    """RL-deconvolve an XLFM camera image into a depth volume.

    otf: (1, D, F0, F1r) complex rFFT of the padded PSF (precompute_otf).
    img: (B, 1, I, I) raw camera image (background already removed).
    init_obj: resume from a previous call's volume instead of the ones
    init — RL's loop state is the object alone, so chaining
    n1-then-n2-iteration calls is numerics-identical to n1+n2 in one
    call PROVIDED roi_depths == D on the intermediate calls (the ROI
    zeroing runs per call, and a zeroed depth stays zero under the
    multiplicative update).  Restartability; also the only way to run
    long iteration counts through the axon tunnel, which kills device
    programs after ~1 min.
    full_hw: the padded canvas (H, W) precompute_otf transformed on.  The
    rFFT bin count is ambiguous about width parity ((W-1)//2+1 == W'//2+1
    for W odd = W'+1 even), so when the true width is odd the even-width
    inference below would silently irfft onto a one-pixel-short canvas —
    pass the (otf, psf_hw, full_hw) triple load_psf_otf returns.
    fourier_sum: sum the forward projection over depth in the FOURIER
    domain (linearity: sum_d irfft2(S_d) == irfft2(sum_d S_d)), so ONE
    single-plane inverse transform replaces one per depth slab — the
    dominant forward-projection segment disappears.  The reference
    applies relu per depth BEFORE its sum (utils.py:700), but each
    per-depth plane is a circular convolution of two nonnegative arrays
    (object x sum-normalized PSF), nonnegative in exact arithmetic — the
    per-depth relu only clips FFT roundoff ringing, so relu-after-sum
    is equivalent to roundoff (equivalence-tested).  Caveat: at pixels
    where the TRUE estimate is near zero the Fourier sum leaves an
    absolute roundoff floor of ~1e-7 x peak (spectral cancellation; the
    per-depth path's nonneg image-domain sum has no cancellation), and
    the RL ratio can amplify that into relative — not absolute —
    divergence at low-signal voxels over iterations.  Set False for the
    reference's literal per-depth order.
    Returns (volume (B, D, obj_hw), img_est (B, 1, F0, F1)).  On
    FFT-fallback backends (SpecPair otf) img_est is computed only on the
    camera-support window and zero elsewhere — the RL update never reads
    it outside that window (img_exp is exactly 0 there).
    """
    n_depths = otf.shape[1]
    if full_hw is None:
        full_hw = (otf.shape[2], (otf.shape[3] - 1) * 2)
    full_hw = tuple(full_hw)

    img_exp = _pad_center(img.astype(jnp.float32), full_hw)
    if init_obj is None:
        obj = jnp.ones((img.shape[0], n_depths) + tuple(obj_hw),
                       jnp.float32)
    else:
        assert init_obj.shape == (img.shape[0], n_depths) + tuple(obj_hw)
        obj = init_obj.astype(jnp.float32)

    pad_h = (full_hw[0] - obj_hw[0]) // 2
    pad_w = (full_hw[1] - obj_hw[1]) // 2

    chunk = (n_depths if depth_chunk is None
             else min(depth_chunk, n_depths))
    n_chunks = -(-n_depths // chunk)
    # ragged depth counts zero-pad to a whole slab rather than shrinking
    # the chunk (a prime n_depths would degrade to chunk=1, i.e. one
    # 1-plane scan step per depth): a zero OTF plane contributes nothing
    # to the forward sum and its back-projected correction is zero, so a
    # zero-initialized pad depth stays zero under the multiplicative
    # update and is sliced off after the loop.
    d_pad = n_chunks * chunk - n_depths
    d_total = n_depths + d_pad
    if d_pad:
        pads = [(0, 0), (0, d_pad), (0, 0), (0, 0)]
        otf = jax.tree.map(lambda o: jnp.pad(o, pads), otf)
        obj = jnp.pad(obj, pads)
    b_sz = img.shape[0]

    # depth-chunked slabs as a lax.scan: an unrolled Python loop lets the
    # XLA scheduler run slabs CONCURRENTLY, keeping every slab's canvas
    # temporaries live at once (measured 19.3 GB > HBM at the reference
    # CLI scale with 8 slabs) — scan is truly sequential, so one slab's
    # working set is live at a time.  Each slab pads to the FFT canvas
    # only while its FFTs run (padding all of obj first is
    # ~(full/obj)^2 x the bytes: 3.7 GB vs 173 MB at 2880^2 x 120).
    otf_scan = jax.tree.map(
        lambda o: jnp.swapaxes(
            o.reshape(1, n_chunks, chunk, *o.shape[-2:]), 0, 1), otf)

    def _chunked(ob):
        return jnp.swapaxes(
            ob.reshape(b_sz, n_chunks, chunk, *obj_hw), 0, 1)

    is_pair = isinstance(otf, SpecPair)
    i_h, i_w = img.shape[-2:]
    ip_h = (full_hw[0] - i_h) // 2
    ip_w = (full_hw[1] - i_w) // 2
    img_f = img.astype(jnp.float32)

    f_hw = jax.tree.leaves(otf)[0].shape[-2:]

    def body(_, state):
        obj, _prev_est = state

        if fourier_sum:
            # depth sum by linearity in the Fourier domain: each slab
            # contributes one spectrum-plane accumulate; a SINGLE
            # 1-plane inverse transform then replaces the per-slab
            # inverses (relu moves after the sum — see the docstring)
            def fwd(acc, xs):
                ob, ot = xs
                prod = spec_mul(rfft2_padded(ob, full_hw), ot)
                if is_pair:
                    return SpecPair(acc.re + prod.re.sum(1, keepdims=True),
                                    acc.im + prod.im.sum(1, keepdims=True)
                                    ), None
                return acc + prod.sum(1, keepdims=True), None

            acc0 = (SpecPair(jnp.zeros((b_sz, 1) + f_hw, jnp.float32),
                             jnp.zeros((b_sz, 1) + f_hw, jnp.float32))
                    if is_pair else
                    jnp.zeros((b_sz, 1) + f_hw, jnp.complex64))
            spec, _ = jax.lax.scan(fwd, acc0, (_chunked(obj), otf_scan))
            if is_pair:
                # evaluate just the camera-support window of the inverse
                # (the estimate is only ever read where img_exp != 0)
                from cwfa_tpu.ops.gemm_fft import irfft2_window_gemm_pair
                est = irfft2_window_gemm_pair(
                    spec.re, spec.im, full_hw, (ip_h, i_h), (ip_w, i_w))
            else:
                est = fftshift2d_real(irfft2(spec, s=full_hw))
            est = jax.nn.relu(est)
        else:
            def fwd(acc, xs):
                ob, ot = xs
                prod = spec_mul(rfft2_padded(ob, full_hw), ot)
                if is_pair:
                    # matmul-DFT path: the estimate is only ever read
                    # where img_exp != 0 (ratio is exactly 0 elsewhere,
                    # and the nonzero-median ignores zeros), so evaluate
                    # just the camera-support window of the inverse
                    from cwfa_tpu.ops.gemm_fft import \
                        irfft2_window_gemm_pair
                    est = irfft2_window_gemm_pair(
                        prod.re, prod.im, full_hw,
                        (ip_h, i_h), (ip_w, i_w),
                        pack_depth=_pack_inverse_pairs())
                else:
                    est = fftshift2d_real(irfft2(prod, s=full_hw))
                return acc + jax.nn.relu(est).sum(1, keepdims=True), None

            est0 = jnp.zeros((b_sz, 1, i_h, i_w), jnp.float32) if is_pair \
                else jnp.zeros_like(img_exp)
            est, _ = jax.lax.scan(fwd, est0, (_chunked(obj), otf_scan))
        ratio = (img_f if is_pair else img_exp) / (est + 1e-8)
        # per-frame clamp limit: batched deconvolution == B independent
        # reference runs (the median is a per-frame statistic)
        limit = (_median_nonzero_batch(ratio).reshape(-1, 1, 1, 1)
                 * update_median_limit_multiplier)
        ratio = jnp.clip(ratio, 0.0, limit)
        if is_pair:
            # the ratio is exactly 0 outside the camera support (as
            # img_exp/(x+eps) is on the padded canvas), so its transform
            # is a windowed-input rfft2 — never materialize the pad.
            # est itself is carried WINDOW-sized through the loop (only
            # the final iteration's value is returned; padding it to the
            # canvas every iteration wrote ~(canvas/window)^2 more bytes
            # per carry for nothing) and padded once after the loop.
            ratio_fft = rfft2_padded(ratio, full_hw)
        else:
            ratio_fft = rfft2(ratio)
        # back-projection: the multiplicative update only reads the
        # correction inside the object window, so crop each slab BEFORE
        # the multiply — obj_pad * corr cropped == obj * crop(corr)
        # exactly — and never materialize the full-canvas correction;
        # the per-slab conj fuses into the spectral multiply

        def bwd(_, xs):
            ob, ot = xs
            prod = spec_mul(ratio_fft, spec_conj(ot))
            if isinstance(prod, SpecPair):
                # matmul-DFT path: evaluate ONLY the object window of the
                # inverse (exact; the shift+crop folds into the DFT
                # evaluation points — ~3x fewer MACs and ~(canvas/obj)^2
                # less write traffic on the dominant RL segment)
                from cwfa_tpu.ops.gemm_fft import irfft2_window_gemm_pair
                corr = irfft2_window_gemm_pair(
                    prod.re, prod.im, full_hw,
                    (pad_h, obj_hw[0]), (pad_w, obj_hw[1]),
                    pack_depth=_pack_inverse_pairs())
                return None, ob * corr
            corr = fftshift2d_real(irfft2(prod, s=full_hw))
            return None, ob * corr[:, :, pad_h:pad_h + obj_hw[0],
                                   pad_w:pad_w + obj_hw[1]]

        _, new_c = jax.lax.scan(bwd, None, (_chunked(obj), otf_scan))
        new_obj = jnp.swapaxes(new_c, 0, 1).reshape(
            b_sz, d_total, *obj_hw)
        # NaN-freeze instead of the reference's host-side loop break —
        # per frame, so one bad frame never freezes its batch-mates
        bad = jnp.any(jnp.isnan(ratio), axis=(1, 2, 3), keepdims=True)
        new_obj = jnp.where(bad, obj, new_obj)
        return new_obj, est

    est0 = (jnp.zeros((b_sz, 1, i_h, i_w), jnp.float32) if is_pair
            else jnp.zeros_like(img_exp))
    obj, img_est = jax.lax.fori_loop(0, n_iter, body, (obj, est0))
    if is_pair:
        img_est = _pad_center(img_est, full_hw)
    obj = obj[:, :n_depths]

    # zero depths outside the ROI (utils.py:736-737)
    lo = n_depths // 2 - roi_depths // 2
    hi = n_depths // 2 + roi_depths // 2
    d_idx = jnp.arange(n_depths)[None, :, None, None]
    obj = jnp.where((d_idx >= lo) & (d_idx < hi), obj, 0.0)
    return obj, img_est


def xlfm_deconvolve_sharded(mesh, otf, img, n_iter: int, obj_hw=(512, 512),
                            roi_depths: int = 90,
                            update_median_limit_multiplier: float = 10.0,
                            full_hw=None):
    """Depth-sharded RL deconvolution over a device mesh (SURVEY.md §5.7):
    each depth's 2-D FFTs are independent and run shard-locally; the only
    cross-depth operation — the image-estimate sum — is one ``lax.psum``
    over the mesh axis.  Expressed with shard_map so the collective is
    explicit. Numerically identical to ``xlfm_deconvolve``.

    The jitted program is cached on the static configuration: jit's own
    cache keys on callable identity, so rebuilding the shard_map closure
    per call re-traced AND re-compiled the whole n_iter FFT loop for
    EVERY frame of a CLI run (plus the ~25 ms remote-compile round trip
    per frame on this rig)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis = "space" if "space" in mesh.axis_names else mesh.axis_names[-1]
    otf_leaves = jax.tree.leaves(otf)
    cache_key = (mesh, int(n_iter), tuple(obj_hw), int(roi_depths),
                 float(update_median_limit_multiplier),
                 None if full_hw is None else tuple(full_hw),
                 type(otf).__name__, otf_leaves[0].shape,
                 otf_leaves[0].dtype.name)
    cached = _SHARDED_JIT_CACHE.get(cache_key)
    if cached is not None:
        return cached(otf, img)
    n_shards = mesh.shape[axis]
    n_depths = jax.tree.leaves(otf)[0].shape[1]
    assert n_depths % n_shards == 0, (n_depths, n_shards)
    d_local = n_depths // n_shards
    if full_hw is None:     # see xlfm_deconvolve: wrong for odd true width
        full_hw = (otf.shape[2], (otf.shape[3] - 1) * 2)
    full_hw = tuple(full_hw)
    pad_h = (full_hw[0] - obj_hw[0]) // 2
    pad_w = (full_hw[1] - obj_hw[1]) // 2
    mult = update_median_limit_multiplier

    def local_run(otf_l, img_g):
        otf_t = spec_conj(otf_l)
        img_exp = _pad_center(img_g.astype(jnp.float32), full_hw)
        obj = jnp.ones((img_g.shape[0], d_local) + tuple(obj_hw), jnp.float32)

        def body(_, state):
            obj, _prev = state
            # depth sum in Fourier (see xlfm_deconvolve): the psum rides
            # the spectrum and ONE 1-plane inverse runs per shard
            prod = spec_mul(rfft2_padded(obj, full_hw), otf_l)
            if isinstance(prod, SpecPair):
                spec_l = SpecPair(prod.re.sum(1, keepdims=True),
                                  prod.im.sum(1, keepdims=True))
            else:
                spec_l = prod.sum(1, keepdims=True)
            spec_g = jax.lax.psum(spec_l, axis)
            img_est = jax.nn.relu(fftshift2d_real(
                irfft2(spec_g, s=full_hw)))
            ratio = img_exp / (img_est + 1e-8)
            limit = (_median_nonzero_batch(ratio).reshape(-1, 1, 1, 1)
                     * mult)
            ratio = jnp.clip(ratio, 0.0, limit)
            # crop-before-multiply: see xlfm_deconvolve's body
            prod = spec_mul(rfft2(ratio), otf_t)
            if isinstance(prod, SpecPair):
                from cwfa_tpu.ops.gemm_fft import irfft2_window_gemm_pair
                corr = irfft2_window_gemm_pair(
                    prod.re, prod.im, full_hw,
                    (pad_h, obj_hw[0]), (pad_w, obj_hw[1]),
                    pack_depth=_pack_inverse_pairs())
            else:
                corr = fftshift2d_real(irfft2(prod, s=full_hw))[
                    :, :, pad_h:pad_h + obj_hw[0],
                    pad_w:pad_w + obj_hw[1]]
            new_obj = obj * corr
            bad = jnp.any(jnp.isnan(ratio), axis=(1, 2, 3), keepdims=True)
            return jnp.where(bad, obj, new_obj), img_est

        obj, img_est = jax.lax.fori_loop(
            0, n_iter, body, (obj, jnp.zeros_like(img_exp)))
        # global-depth ROI mask for this shard
        shard_ix = jax.lax.axis_index(axis)
        lo = n_depths // 2 - roi_depths // 2
        hi = n_depths // 2 + roi_depths // 2
        d_idx = shard_ix * d_local + jnp.arange(d_local)[None, :, None, None]
        obj = jnp.where((d_idx >= lo) & (d_idx < hi), obj, 0.0)
        return obj, img_est

    run = shard_map(local_run, mesh=mesh,
                    in_specs=(P(None, axis, None, None), P()),
                    out_specs=(P(None, axis, None, None), P()),
                    check_vma=False)
    jitted = jax.jit(run)
    while len(_SHARDED_JIT_CACHE) >= 8:
        _SHARDED_JIT_CACHE.pop(next(iter(_SHARDED_JIT_CACHE)))
    _SHARDED_JIT_CACHE[cache_key] = jitted
    return jitted(otf, img)


_SHARDED_JIT_CACHE: dict = {}
