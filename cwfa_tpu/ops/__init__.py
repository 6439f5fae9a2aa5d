"""Compute ops: FFT convolution, RL deconvolution, Pallas kernels, sampling."""

from cwfa_tpu.ops.fft_conv import (  # noqa: F401
    fftshift2d_real, fft_conv, precompute_otf, xlfm_forward_project,
)
from cwfa_tpu.ops.deconv import xlfm_deconvolve  # noqa: F401
