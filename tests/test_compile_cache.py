"""Persistent XLA compilation cache plumbing (core/compile_cache.py).

The cache itself is JAX machinery; these tests pin OUR contract: directory
resolution, the env off-switch, graceful failure on an uncreatable path,
and that an enabled cache actually persists + reloads an executable across
cache-clear (the cross-process case, exercised in-process via
jax.clear_caches).
"""

import os

import jax
import jax.numpy as jnp

from betapose_tpu.core.compile_cache import enable_compile_cache, DEFAULT_CACHE_DIR


def _restore(old):
    jax.config.update("jax_compilation_cache_dir", old)


def test_explicit_dir_wins(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("BETAPOSE_COMPILE_CACHE", str(tmp_path / "env"))
    try:
        d = enable_compile_cache(str(tmp_path / "explicit"))
        assert d == str(tmp_path / "explicit")
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        _restore(old)


def test_env_dir_used_when_no_arg(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("BETAPOSE_COMPILE_CACHE", str(tmp_path / "env"))
    try:
        d = enable_compile_cache()
        assert d == str(tmp_path / "env")
        assert os.path.isdir(d)
    finally:
        _restore(old)


def test_env_off_switch(monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    for val in ("0", "off", "NONE", "Disabled"):
        monkeypatch.setenv("BETAPOSE_COMPILE_CACHE", val)
        assert enable_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == old


def test_default_dir(monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("BETAPOSE_COMPILE_CACHE", raising=False)
    try:
        assert enable_compile_cache() == DEFAULT_CACHE_DIR
    finally:
        _restore(old)


def test_uncreatable_dir_disables(monkeypatch, tmp_path):
    old = jax.config.jax_compilation_cache_dir
    blocker = tmp_path / "file"
    blocker.write_text("x")
    monkeypatch.delenv("BETAPOSE_COMPILE_CACHE", raising=False)
    assert enable_compile_cache(str(blocker / "sub")) is None
    assert jax.config.jax_compilation_cache_dir == old


def test_cache_roundtrip(tmp_path):
    """An enabled cache persists an executable and serves it back."""
    old = jax.config.jax_compilation_cache_dir
    old_t = jax.config.jax_persistent_cache_min_compile_time_secs
    old_s = jax.config.jax_persistent_cache_min_entry_size_bytes
    cache = str(tmp_path / "xla")
    try:
        enable_compile_cache(cache)
        # Tiny test graphs compile in <1s; drop the persistence thresholds
        # so this one is eligible.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

        f = jax.jit(lambda a: (a @ a).sum() * 3.0)
        x = jnp.ones((16, 16), jnp.float32)
        want = float(f(x))
        entries = [
            os.path.join(r, n)
            for r, _, ns in os.walk(cache)
            for n in ns
            if "autotune" not in r
        ]
        assert entries, "no cache entry written"

        # Fresh compile in the same process: clear in-memory caches and
        # re-jit; the persistent entry must still produce the same result.
        jax.clear_caches()
        g = jax.jit(lambda a: (a @ a).sum() * 3.0)
        assert float(g(x)) == want
    finally:
        _restore(old)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_s)
