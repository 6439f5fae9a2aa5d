"""A/B the gemm-FFT stage factorizations at reference RL-deconv scale.

The round-3 profile (scripts/profile_deconv_segments.py) puts ~207 of the
265 ms isolated-segment sum in the forward windowed rfft2 (117 ms) and the
backward windowed inverse (~90 ms).  The four-step split at N=2880 uses
A=120, B=24, so one stage of every transform is a K=24 (and often N<=26)
GEMM — far below the 128-wide MXU tile.  A dense-direct windowed DFT
(K = 600-window or K = bins) pays ~6-12x the MACs but runs full tiles.
CLAUDE.md: measure, don't model — XLA's lowering of the small-K einsums
has repeatedly beaten the utilization model.

Variants per transform (all exact, HIGHEST precision):
  fwd  (1,30,600,600) -> spectrum (1,30,2880,1441)
    ct      current rfft2_padded (windowed-input four-step both axes)
    denseW  dense W pass (K=600 -> 1441 bins), four-step H
    denseH  four-step W, dense H (K=600 rows -> 2880 bins)
    dense2  dense both
  inv  spectrum (1,30,2880,1441) -> (1,30,600,600) window
    ct      current irfft2_window_gemm_pair
    denseH  dense H stage (K=2880 bins -> 600 rows), folded W stage
    denseW  current H stage, dense folded W (K=1441 -> 600)
    dense2  dense both

Usage: python scripts/bench_gemm_fft_forms.py [--reps 10] [--check]
         [--shipped]   (time only the shipped fwd/inv chains — for
                        CWFA_GEMM_FFT_FACTOR four-step (A,B) sweeps)
"""

import sys
import time
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.ops.fft_conv import rfft2_padded
from cwfa_tpu.ops.gemm_fft import (fft_last_window, idft_window_last,
                                   irfft2_window_gemm_pair, _dft_mats,
                                   _hermitian_ck)

PREC = jax.lax.Precision.HIGHEST
N = 2880
VOL = 600
BINS = N // 2 + 1
H0 = W0 = (N - VOL) // 2


@lru_cache(maxsize=8)
def _dense_fwd_mats(n, i0, il, out_len):
    """F[k, i0+j] for k < out_len, j < il (windowed forward DFT)."""
    k = np.arange(out_len)[:, None]
    j = i0 + np.arange(il)[None, :]
    ang = 2.0 * np.pi * k * j / n
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=8)
def _dense_inv_mats(n, w0u, wl, nb, fold):
    """Windowed inverse: out[m] = sum_k X_k W^{+mk}, m = w0u..w0u+wl-1
    over nb leading bins; fold multiplies by the Hermitian c_k."""
    m = np.arange(w0u, w0u + wl)[:, None]
    k = np.arange(nb)[None, :]
    ang = 2.0 * np.pi * m * k / n
    cr, ci = np.cos(ang), np.sin(ang)
    if fold:
        ck = np.full(nb, 2.0)
        ck[0] = 1.0
        if n % 2 == 0 and nb == n // 2 + 1:
            ck[-1] = 1.0
        cr, ci = cr * ck, ci * ck
    return cr.astype(np.float32), ci.astype(np.float32)


# ---------------- forward variants ----------------

def fwd_w_dense(x):
    fr, fi = map(jnp.asarray, _dense_fwd_mats(N, W0, VOL, BINS))
    yr = jnp.einsum("kw,...w->...k", fr, x, precision=PREC)
    yi = jnp.einsum("kw,...w->...k", fi, x, precision=PREC)
    return yr, yi


def fwd_h_dense(yr, yi):
    fr, fi = map(jnp.asarray, _dense_fwd_mats(N, H0, VOL, N))
    dot = partial(jnp.einsum, "kh,...hw->...kw", precision=PREC)
    return dot(fr, yr) - dot(fi, yi), dot(fr, yi) + dot(fi, yr)


def fwd_w_ct(x):
    return fft_last_window(x, None, W0, N, out_len=BINS, precision=PREC)


def fwd_h_ct(yr, yi):
    yr, yi = jnp.moveaxis(yr, -2, -1), jnp.moveaxis(yi, -2, -1)
    zr, zi = fft_last_window(yr, yi, H0, N, precision=PREC)
    return jnp.moveaxis(zr, -1, -2), jnp.moveaxis(zi, -1, -2)


def fwd(x, wform, hform):
    yr, yi = (fwd_w_dense if wform == "dense" else fwd_w_ct)(x)
    return (fwd_h_dense if hform == "dense" else fwd_h_ct)(yr, yi)


# ---------------- inverse variants ----------------

def inv_h_dense(xr, xi):
    # post-shift rows H0..H0+VOL read unshifted m - N//2 (even N)
    fr, fi = map(jnp.asarray, _dense_inv_mats(N, H0 - N // 2, VOL, N, False))
    dot = partial(jnp.einsum, "mh,...hw->...mw", precision=PREC)
    return dot(fr, xr) - dot(fi, xi), dot(fr, xi) + dot(fi, xr)


def inv_h_ct(xr, xi):
    yr, yi = jnp.moveaxis(xr, -2, -1), jnp.moveaxis(xi, -2, -1)
    yr, yi = idft_window_last(yr, yi, H0 - N // 2, VOL, precision=PREC)
    return jnp.moveaxis(yr, -1, -2), jnp.moveaxis(yi, -1, -2)


def inv_w_dense(yr, yi):
    fr, fi = map(jnp.asarray, _dense_inv_mats(N, W0 - N // 2, VOL, BINS, True))
    out = (jnp.einsum("mw,...w->...m", fr, yr, precision=PREC)
           - jnp.einsum("mw,...w->...m", fi, yi, precision=PREC))
    return out / (N * N)


def inv_w_ct(yr, yi):
    ck = _hermitian_ck(BINS, N)
    out, _ = idft_window_last(yr * ck, yi * ck, W0 - N // 2, VOL,
                              real_out=True, precision=PREC, n=N)
    return out / (N * N)


def inv(xr, xi, hform, wform):
    yr, yi = (inv_h_dense if hform == "dense" else inv_h_ct)(xr, xi)
    return (inv_w_dense if wform == "dense" else inv_w_ct)(yr, yi)


def timeit(fn, args, reps, tag):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.reshape(-1)[:2])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{tag:28s} {dt:8.2f} ms/slab  ({dt * 4:7.1f} /iter-equiv)",
          flush=True)
    return dt


def main(argv):
    reps, check = 10, "--check" in argv
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])
    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind} reps={reps}", flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 30, VOL, VOL), jnp.float32)

    if check:
        # exactness: compare every variant against the current path (CPU ok)
        sr, si = jax.jit(partial(fwd, wform="ct", hform="ct"))(x)
        for wf in ("ct", "dense"):
            for hf in ("ct", "dense"):
                ar, ai = jax.jit(partial(fwd, wform=wf, hform=hf))(x)
                err = max(float(jnp.max(jnp.abs(ar - sr))),
                          float(jnp.max(jnp.abs(ai - si))))
                print(f"fwd {wf}/{hf} vs ct: max abs err {err:.3e}")
        ref = jax.jit(partial(inv, hform="ct", wform="ct"))(sr, si)
        for hf in ("ct", "dense"):
            for wf in ("ct", "dense"):
                out = jax.jit(partial(inv, hform=hf, wform=wf))(sr, si)
                err = float(jnp.max(jnp.abs(out - ref)))
                print(f"inv {hf}/{wf} vs ct: max abs err {err:.3e}")
        lib = irfft2_window_gemm_pair(sr, si, (N, N), (H0, VOL), (W0, VOL),
                                      precision=PREC)
        print(f"inv ct/ct vs library: {float(jnp.max(jnp.abs(lib-ref))):.3e}")
        return

    if "--shipped" in argv:
        import os
        fac = os.environ.get("CWFA_GEMM_FFT_FACTOR", "(auto)")
        print(f"-- shipped chains only, four-step factor A={fac}")
        timeit(jax.jit(partial(fwd, wform="dense", hform="ct")), (x,), reps,
               f"fwd W=dense H=ct A={fac}")
        sr, si = jax.jit(partial(fwd, wform="ct", hform="ct"))(x)
        timeit(jax.jit(partial(inv, hform="ct", wform="dense")), (sr, si),
               reps, f"inv H=ct W=dense A={fac}")
        return

    print("-- forward (1,30,600,600) -> (1,30,2880,1441)")
    forms = [("ct", "ct"), ("dense", "ct"), ("ct", "dense"),
             ("dense", "dense")]
    for wf, hf in forms:
        timeit(jax.jit(partial(fwd, wform=wf, hform=hf)), (x,), reps,
               f"fwd W={wf} H={hf}")
    t_lib = timeit(jax.jit(lambda v: rfft2_padded(v, (N, N))), (x,), reps,
                   "fwd library rfft2_padded")

    sr, si = jax.jit(partial(fwd, wform="ct", hform="ct"))(x)
    print("-- inverse (1,30,2880,1441) -> (1,30,600,600)")
    for hf, wf in forms:
        timeit(jax.jit(partial(inv, hform=hf, wform=wf)), (sr, si), reps,
               f"inv H={hf} W={wf}")
    timeit(jax.jit(lambda a, b: irfft2_window_gemm_pair(
        a, b, (N, N), (H0, VOL), (W0, VOL), precision=PREC)),
        (sr, si), reps, "inv library window pair")


if __name__ == "__main__":
    main(sys.argv[1:])
