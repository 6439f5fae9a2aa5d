"""Per-program XLA compiler-option overrides (TPU backend flags).

The local jaxlib is CPU-only: TPU flags placed in XLA_FLAGS abort in the
local parser ("Unknown flag") before any compile request is made.  They CAN
reach the TPU compiler through ``jax.jit(..., compiler_options=...)``, which
serializes them into the executable-build options shipped with the remote
compile request (the remote tpu_compile_helper validates names — bogus ones
return HTTP 500; see scripts/probe_compiler_flags.py for the accepted set).

``CWFA_COMPILER_OPTIONS`` holds comma-separated ``name=value`` pairs, e.g.::

    CWFA_COMPILER_OPTIONS="xla_tpu_scoped_vmem_limit_kib=65536" \
        python scripts/bench_fps.py 16 --int8

Values stay strings (the XLA env-override parser does its own typing).
The persistent compilation cache keys on compile options, so sweeping
flags never poisons cached baselines.
"""

from __future__ import annotations

import os


def compiler_options():
    """dict for jax.jit(compiler_options=...), or None when unset/empty."""
    raw = os.environ.get("CWFA_COMPILER_OPTIONS", "").strip()
    if not raw:
        return None
    opts = {}
    for pair in raw.split(","):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ValueError(
                f"CWFA_COMPILER_OPTIONS entry {pair!r} is not name=value")
        name, value = pair.split("=", 1)
        opts[name.strip()] = value.strip()
    return opts or None
