"""Persistent-compile-cache resolution (core/cache.py).

The product entry points (CLI, serve) must warm from the same `.jax_cache/`
the benchmarks use, honor LOCO_COMPILE_CACHE overrides, and never clobber an
explicit JAX configuration. Pure config-level tests — no compilation here.
"""

import os

import jax
import pytest

from loco_edit_tpu.core.cache import default_cache_dir, enable_compile_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def clean_cache_config(monkeypatch):
    """Snapshot/restore the global jax cache config around each test."""
    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("LOCO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    jax.config.update("jax_compilation_cache_dir", None)
    yield monkeypatch
    jax.config.update("jax_compilation_cache_dir", prev)


def test_default_is_repo_jax_cache(clean_cache_config):
    # running from the checkout: shared with bench.py
    assert default_cache_dir() == os.path.join(REPO, ".jax_cache")
    path = enable_compile_cache()
    assert path == os.path.join(REPO, ".jax_cache")
    assert jax.config.jax_compilation_cache_dir == path
    assert os.path.isdir(path)


def test_env_override_and_disable(clean_cache_config, tmp_path):
    clean_cache_config.setenv("LOCO_COMPILE_CACHE", str(tmp_path / "cc"))
    path = enable_compile_cache()
    assert path == str(tmp_path / "cc") and os.path.isdir(path)

    jax.config.update("jax_compilation_cache_dir", None)
    clean_cache_config.setenv("LOCO_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir is None


def test_existing_config_wins(clean_cache_config, tmp_path):
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    assert enable_compile_cache() == str(tmp_path)  # untouched
    assert jax.config.jax_compilation_cache_dir == str(tmp_path)


def test_idempotent(clean_cache_config):
    assert enable_compile_cache() == enable_compile_cache()
