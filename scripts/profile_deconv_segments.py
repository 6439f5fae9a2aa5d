"""Per-segment profile of one RL deconvolution iteration at reference
CLI scale (camera 2160^2, volume 600x600x120, canvas 2880^2, chunk 30).

Times each piece of ops/deconv.xlfm_deconvolve's loop body as a
standalone jitted program with the enqueue-N/fetch-tiny-slice barrier
(block_until_ready is unreliable through the axon tunnel), then compares
the sum against the measured full-iteration figure from
scripts/bench_deconv.py.  Isolated jits can mis-rank XLA fusions
(CLAUDE.md round-3), so treat the split as attribution, not gospel —
A/B any change inside bench_deconv.

Usage: python scripts/profile_deconv_segments.py [--chunk 30] [--reps 10]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.ops.fft_conv import (SpecPair, precompute_otf, rfft2_padded,
                                   spec_mul, spec_conj)
from cwfa_tpu.ops.deconv import _median_nonzero
from cwfa_tpu.ops.gemm_fft import irfft2_window_gemm_pair


def timeit(fn, args, reps, tag):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:2])          # compile barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:2])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag:34s} {dt:8.2f} ms", flush=True)
    return dt


def main(argv):
    chunk, reps = 30, 10
    i = 0
    while i < len(argv):
        if argv[i] == "--chunk":
            i += 1
            chunk = int(argv[i])
        elif argv[i] == "--reps":
            i += 1
            reps = int(argv[i])
        i += 1

    n_depths, psf_px, vol_px, img_px = 120, 2160, 600, 2160
    n_slabs = n_depths // chunk
    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind} chunk={chunk} "
          f"slabs={n_slabs} reps={reps}", flush=True)

    @jax.jit
    def make_psf():
        p = jax.random.uniform(jax.random.PRNGKey(0),
                               (1, n_depths, psf_px, psf_px), jnp.float32)
        return p / p.sum(axis=(-2, -1), keepdims=True)

    t0 = time.perf_counter()
    otf, full_hw = precompute_otf(make_psf(), (vol_px, vol_px))
    _ = np.asarray(jax.tree.leaves(otf)[0][0, 0, :2, 0])
    print(f"OTF: full_hw={full_hw} {otf.nbytes/1e9:.2f} GB "
          f"({time.perf_counter()-t0:.1f} s)", flush=True)
    is_pair = isinstance(otf, SpecPair)
    assert is_pair, "profiler targets the matmul-DFT (SpecPair) path"

    otf_slab = jax.tree.map(lambda o: o[:, :chunk], otf)
    key = jax.random.PRNGKey(1)
    obj_slab = jax.random.uniform(key, (1, chunk, vol_px, vol_px),
                                  jnp.float32)
    img = jax.random.uniform(key, (1, 1, img_px, img_px), jnp.float32) * 100

    f_hw = jax.tree.leaves(otf)[0].shape[-2:]
    pad_h = (full_hw[0] - vol_px) // 2
    pad_w = (full_hw[1] - vol_px) // 2
    ip_h = (full_hw[0] - img_px) // 2
    ip_w = (full_hw[1] - img_px) // 2

    # --- forward: windowed-input transform + spectral multiply + depth sum
    @jax.jit
    def fwd_slab(ob, ot):
        prod = spec_mul(rfft2_padded(ob, full_hw), ot)
        return SpecPair(prod.re.sum(1, keepdims=True),
                        prod.im.sum(1, keepdims=True))

    # transform alone (materializes the slab spectrum the fused form may not)
    fwd_fft = jax.jit(lambda ob: rfft2_padded(ob, full_hw))

    # --- est: single-plane windowed inverse onto the camera support
    @jax.jit
    def est_inv(sr, si):
        return irfft2_window_gemm_pair(sr, si, full_hw,
                                       (ip_h, img_px), (ip_w, img_px))

    # --- ratio + median clamp
    @jax.jit
    def ratio_med(est, im):
        ratio = im / (est + 1e-8)
        limit = _median_nonzero(ratio) * 10.0
        return jnp.clip(ratio, 0.0, limit)

    # --- ratio forward transform (wide window -> pad + full transform)
    ratio_fft = jax.jit(lambda r: rfft2_padded(r, full_hw))

    # --- backward: spectral multiply vs conj OTF + windowed inverse + update
    @jax.jit
    def bwd_slab(rf_re, rf_im, ot, ob):
        prod = spec_mul(SpecPair(rf_re, rf_im), spec_conj(ot))
        corr = irfft2_window_gemm_pair(prod.re, prod.im, full_hw,
                                       (pad_h, vol_px), (pad_w, vol_px))
        return ob * corr

    bwd_mul = jax.jit(lambda rr, ri, ot: spec_mul(SpecPair(rr, ri),
                                                  spec_conj(ot)))

    spec1 = SpecPair(jnp.zeros((1, 1) + tuple(f_hw), jnp.float32),
                     jnp.zeros((1, 1) + tuple(f_hw), jnp.float32))
    est = jnp.ones((1, 1, img_px, img_px), jnp.float32)

    t_fft = timeit(fwd_fft, (obj_slab,), reps, "fwd windowed-input rfft2/slab")
    t_fwd = timeit(fwd_slab, (obj_slab, otf_slab), reps,
                   "fwd rfft2+mul+sum /slab")
    sp = fwd_slab(obj_slab, otf_slab)
    t_est = timeit(est_inv, (sp.re, sp.im), reps, "est windowed inverse (1pl)")
    t_rat = timeit(ratio_med, (est, img), reps, "ratio + bit-descent median")
    ratio = ratio_med(est, img)
    t_rft = timeit(ratio_fft, (ratio,), reps, "ratio pad+full rfft2 (1pl)")
    rf = ratio_fft(ratio)
    t_bmul = timeit(bwd_mul, (rf.re, rf.im, otf_slab), reps,
                    "bwd spec_mul /slab")
    t_bwd = timeit(bwd_slab, (rf.re, rf.im, otf_slab, obj_slab), reps,
                   "bwd mul+winv+update /slab")

    total = n_slabs * (t_fwd + t_bwd) + t_est + t_rat + t_rft
    print(f"\nsum of segments ({n_slabs} slabs): {total:8.2f} ms/iter "
          f"(bench_deconv full-loop figure for comparison)")
    print(f"  forward  {n_slabs * t_fwd:7.2f}  (fft alone "
          f"{n_slabs * t_fft:.2f})")
    print(f"  backward {n_slabs * t_bwd:7.2f}  (mul alone "
          f"{n_slabs * t_bmul:.2f})")
    print(f"  est/ratio/median/ratio_fft {t_est + t_rat + t_rft:7.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
