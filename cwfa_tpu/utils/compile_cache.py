"""Persistent XLA compilation cache for every framework entry point.

The reference has no equivalent (PyTorch eager pays no per-process
compile); on this stack every fresh process re-compiles its whole jitted
program set THROUGH THE REMOTE COMPILE SERVICE (~25 ms HTTP round trip
per compile plus the compile itself — measured 34.8 s for a single
trivial jit in a cold process, ~4-6 min for bench.py's program set).
JAX's on-disk compilation cache works through the axon backend
(measured: the same trivial-jit process drops 34.8 s -> 0.69 s on a
warm cache; cache-hit executables verified numerically) — so the CLIs,
bench, and driver entry enable it by default.

Cache keys include the HLO hash, compile options, jaxlib version, and
platform/topology, so entries can never be served across incompatible
configurations; concurrent processes are safe (atomic tmp+rename
writes).  Disable with ``CWFA_COMPILE_CACHE=0`` (or point it at a
different directory).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/cwfa_tpu/xla")

_OFF = ("0", "off", "none", "disable", "disabled")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache.

    path: cache directory; default ``$CWFA_COMPILE_CACHE`` or
    ``~/.cache/cwfa_tpu/xla``.  ``CWFA_COMPILE_CACHE=0`` (or passing a
    falsy-named path) disables and returns None.  Safe to call more than
    once and at any point before or between compiles; already-jitted
    in-process programs are unaffected.
    """
    if path is None:
        path = os.environ.get("CWFA_COMPILE_CACHE", DEFAULT_DIR)
    if not path or path.lower() in _OFF:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
