"""Profiling and debug helpers.

Reference §5.1: the PyTorch code times with CUDA events and has commented-out
torch.profiler Chrome-trace exports (CWFA.py:14-15,683,876-888).  TPU
equivalents: ``jax.profiler.trace`` (Perfetto/XPlane) and
fetch-barrier-bracketed host timers.

Reference §5.2: no sanitizers exist (single-device code); the numerical
tripwires are NaN checks.  ``debug_nans`` flips JAX's global NaN debugging
on for a scope."""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a scope into ``log_dir`` (view with Perfetto/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scope-local jax_debug_nans (reference-equivalent of its loud NaN
    raises, CWFA.py:825-828,989-994)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class FrameTimer:
    """Fetch-barrier frame timer (the CUDA-event analogue)."""

    def __init__(self):
        self.times: list = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, device_array=None):
        if device_array is not None:
            np.asarray(device_array.ravel()[:2])  # sync barrier
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self):
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def min(self):
        return float(np.min(self.times)) if self.times else 0.0
