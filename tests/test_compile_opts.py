"""CWFA_COMPILER_OPTIONS parsing (utils/compile_opts.py) — the hook that
ships TPU backend flags with the remote compile request (the local CPU-only
jaxlib rejects them in XLA_FLAGS before any request is made)."""

import pytest

from cwfa_tpu.utils.compile_opts import compiler_options


def test_unset_and_empty_return_none(monkeypatch):
    monkeypatch.delenv("CWFA_COMPILER_OPTIONS", raising=False)
    assert compiler_options() is None
    monkeypatch.setenv("CWFA_COMPILER_OPTIONS", "  ")
    assert compiler_options() is None
    monkeypatch.setenv("CWFA_COMPILER_OPTIONS", ", ,")
    assert compiler_options() is None


def test_pairs_parse_with_whitespace_and_value_equals(monkeypatch):
    monkeypatch.setenv(
        "CWFA_COMPILER_OPTIONS",
        " xla_tpu_scoped_vmem_limit_kib = 65536 ,"
        "xla_tpu_memory_bound_loop_optimizer_options=enabled:true,"
        "weird=a=b")
    assert compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_memory_bound_loop_optimizer_options": "enabled:true",
        # only the FIRST '=' splits — values may themselves contain '='
        "weird": "a=b",
    }


def test_malformed_entry_raises(monkeypatch):
    monkeypatch.setenv("CWFA_COMPILER_OPTIONS", "no_equals_here")
    with pytest.raises(ValueError, match="name=value"):
        compiler_options()


def test_jit_accepts_parsed_options(monkeypatch):
    """The parsed dict must be consumable by jax.jit on the test platform
    (generic XLA option names work on every backend)."""
    import jax
    import jax.numpy as jnp

    monkeypatch.setenv("CWFA_COMPILER_OPTIONS",
                       "xla_backend_optimization_level=2")
    opts = compiler_options()
    out = jax.jit(lambda x: x + 1, compiler_options=opts)(jnp.zeros((2,)))
    assert float(out[0]) == 1.0
