"""Persistent compile cache gating (utils/compile_cache.py): disabled for
CPU-only processes (cross-machine AOT artifacts can SIGILL through the
tunneled runtime) and by COGVIEW_COMPILE_CACHE=""."""

import os

import jax

from cogview_tpu.utils.compile_cache import enable_persistent_cache


def test_cpu_process_skips_cache(tmp_path, monkeypatch):
    # the test session pins jax_platforms to cpu (conftest), which is
    # exactly the configuration that must skip the cache
    assert (jax.config.jax_platforms or "").split(",")[0] == "cpu"
    monkeypatch.setenv("COGVIEW_COMPILE_CACHE", str(tmp_path / "xla"))
    assert enable_persistent_cache() == ""
    assert not (tmp_path / "xla").exists()


def test_env_empty_disables(monkeypatch):
    monkeypatch.setenv("COGVIEW_COMPILE_CACHE", "")
    assert enable_persistent_cache() == ""
