"""Persistent compilation cache plumbing (utils/compile_cache.py)."""

import jax

from cwfa_tpu.utils.compile_cache import enable_compile_cache


def test_enable_sets_config_and_creates_dir(tmp_path, monkeypatch):
    import os
    d = str(tmp_path / "xla_cache")
    monkeypatch.setenv("CWFA_COMPILE_CACHE", d)
    before = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compile_cache() == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # explicit path argument wins over the env var
        d2 = str(tmp_path / "other")
        assert enable_compile_cache(d2) == d2
        assert jax.config.jax_compilation_cache_dir == d2
    finally:
        # restore the session-wide cache dir (conftest enables it for the
        # whole suite; resetting to None here would silently disable it
        # for every later test module)
        jax.config.update("jax_compilation_cache_dir", before)


def test_disable_values(tmp_path, monkeypatch):
    before = jax.config.jax_compilation_cache_dir
    for off in ("0", "off", "Disabled"):
        monkeypatch.setenv("CWFA_COMPILE_CACHE", off)
        assert enable_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == before
