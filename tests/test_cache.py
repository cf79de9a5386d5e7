"""Persistent compilation cache plumbing (vitax/core/cache.py).

Measured through the axon TPU tunnel: 256 s cold compile+claim -> 2.4 s in
a fresh process once the on-disk cache is warm. Every CLI enables it at
startup; these tests pin the config wiring and knobs on CPU.
"""

import os

import jax


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    import vitax.core.cache as cache
    monkeypatch.setattr(cache, "_ENABLED_DIR", None)
    d = str(tmp_path / "cache")
    got = cache.enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_no_cache_env_disables(tmp_path, monkeypatch):
    import vitax.core.cache as cache
    monkeypatch.setattr(cache, "_ENABLED_DIR", None)
    monkeypatch.setenv("VITAX_NO_CACHE", "1")
    assert cache.enable_compilation_cache(str(tmp_path / "x")) is None


def test_default_dir_prefers_repo_checkout(monkeypatch):
    import vitax.core.cache as cache
    monkeypatch.delenv("VITAX_CACHE_DIR", raising=False)
    d = cache.default_cache_dir()
    assert d.endswith(".jax_cache") or "vitax" in d
    monkeypatch.setenv("VITAX_CACHE_DIR", "/tmp/somewhere")
    assert cache.default_cache_dir() == "/tmp/somewhere"
