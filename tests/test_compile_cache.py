"""Persistent-compile-cache wiring: env control and config application."""

import jax
import pytest

from dbsr_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_uses_env_dir(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    monkeypatch.setenv("DBSR_TPU_COMPILE_CACHE", str(d))
    assert enable_persistent_cache() == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)


def test_env_zero_disables(monkeypatch):
    monkeypatch.setenv("DBSR_TPU_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None


def test_explicit_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("DBSR_TPU_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "explicit")
    assert enable_persistent_cache(d) == d
