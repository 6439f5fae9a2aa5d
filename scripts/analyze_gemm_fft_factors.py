"""Compile-only cost analysis of the shipped gemm-FFT deconv chains
across four-step (A, B) factor choices (CWFA_GEMM_FFT_FACTOR).

Timing through the axon tunnel needs a healthy execution path; XLA's
cost_analysis only needs the (separate) compile service, and CLAUDE.md
round-3 found it often more decisive than isolated timing anyway.  For
each factor A dividing 2880 this lowers + compiles

  fwd: rfft2_window_input (dense W stage, four-step H stage)
  inv: irfft2_window_gemm_pair (four-step H stage, dense folded W stage)

at reference RL shapes and prints flops / bytes accessed / peak-memory
estimates per slab.  Rank hint only — A/B the winner inside
bench_deconv when the tunnel executes again.

Usage: python scripts/analyze_gemm_fft_factors.py [factors...]
"""

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

N = 2880
VOL = 600
BINS = N // 2 + 1
H0 = W0 = (N - VOL) // 2


def chains():
    """The shipped transform chains (gf reads the factor env per trace)."""
    import cwfa_tpu.ops.gemm_fft as gf
    prec = jax.lax.Precision.HIGHEST

    def fwd(x):
        return gf.rfft2_window_input_gemm_pair(x, (N, N), precision=prec)

    def inv(xr, xi):
        return gf.irfft2_window_gemm_pair(
            xr, xi, (N, N), (H0, VOL), (W0, VOL), precision=prec)

    return fwd, inv


def analyze(fn, args, tag):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    # cost_analysis returns a dict (or [dict] on older jax)
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    fl = ca.get("flops", float("nan"))
    by = ca.get("bytes accessed", float("nan"))
    ma = c.memory_analysis()
    peak = getattr(ma, "temp_size_in_bytes", 0) + getattr(
        ma, "output_size_in_bytes", 0)
    print(f"{tag:24s} flops {fl/1e9:8.1f} G   bytes {by/1e9:7.2f} GB   "
          f"temp+out {peak/1e9:6.2f} GB", flush=True)
    return fl, by


def main(argv):
    factors = [int(a) for a in argv] or [120, 96, 80, 64, 48, 40, 32, 24]
    dev = jax.devices()[0]
    print(f"target={dev.platform}:{dev.device_kind}  (compile-only; "
          f"nothing executes)", flush=True)
    x = jnp.zeros((1, 30, VOL, VOL), jnp.float32)
    sr = jnp.zeros((1, 30, N, BINS), jnp.float32)
    si = sr
    for a in factors:
        if N % a:
            print(f"A={a}: skip (does not divide {N})")
            continue
        os.environ["CWFA_GEMM_FFT_FACTOR"] = str(a)
        fwd, inv = chains()
        analyze(fwd, (x,), f"fwd A={a} B={N // a}")
        analyze(inv, (sr, si), f"inv A={a} B={N // a}")
    os.environ.pop("CWFA_GEMM_FFT_FACTOR", None)


if __name__ == "__main__":
    main(sys.argv[1:])
