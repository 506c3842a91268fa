"""Persistent-compilation-cache helper (utils/compile_cache.py).

The reference has no analog (eager torch); this is TPU-native startup
polish — reruns of an identical config skip the multi-second XLA
train-step compile. These tests cover the config plumbing; the measured
cold/warm CLI A/B lives in DESIGN.md ("Persistent compilation cache").
"""

import jax
import pytest

from robust_nerf_tpu.utils.compile_cache import (
    default_cache_dir,
    enable_compilation_cache,
)


@pytest.fixture
def restore_cache_config():
    from robust_nerf_tpu.utils import compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_ours = cc._ours
    # Earlier suite tests drive the CLI mains, which call
    # enable_compilation_cache("auto"); start each test from a clean slate.
    jax.config.update("jax_compilation_cache_dir", "")
    cc._ours = None
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    cc._ours = prev_ours


def test_off_is_noop(restore_cache_config):
    prev = jax.config.jax_compilation_cache_dir
    for val in (None, "", "off"):
        assert enable_compilation_cache(val) is None
    assert jax.config.jax_compilation_cache_dir == prev


def test_explicit_dir(tmp_path, restore_cache_config):
    target = tmp_path / "xla_cache"
    got = enable_compilation_cache(str(target))
    assert got == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)
    # Only slow (>= 1 s) compiles persist — tiny jits skip the disk.
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 1.0


def test_user_config_wins(tmp_path, restore_cache_config):
    theirs = str(tmp_path / "user_cache")
    jax.config.update("jax_compilation_cache_dir", theirs)
    assert enable_compilation_cache("auto") is None
    assert enable_compilation_cache(str(tmp_path / "other")) is None
    assert jax.config.jax_compilation_cache_dir == theirs


def test_own_setting_can_be_repointed(tmp_path, restore_cache_config):
    """A dir set by THIS module (e.g. an earlier CLI 'auto') is not user
    config — a later explicit --compile_cache must win over it."""
    first = enable_compilation_cache(str(tmp_path / "first"))
    assert first == str(tmp_path / "first")
    second = enable_compilation_cache(str(tmp_path / "second"))
    assert second == str(tmp_path / "second")
    assert jax.config.jax_compilation_cache_dir == second


def test_auto_env_override(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.setenv("ROBUST_NERF_COMPILE_CACHE", str(tmp_path / "env_cache"))
    assert default_cache_dir() == str(tmp_path / "env_cache")


def test_auto_disabled_on_cpu(restore_cache_config):
    """'auto' must not persist XLA:CPU AOT code (reload across toolchain
    drift warns/SIGILLs); explicit dirs stay honored (test_explicit_dir).
    The test env forces the CPU backend (conftest)."""
    assert jax.default_backend() == "cpu"
    assert enable_compilation_cache("auto") is None
    assert not jax.config.jax_compilation_cache_dir


def test_cache_round_trip(tmp_path, restore_cache_config):
    """A compiled program actually lands in the cache directory."""
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "")
    enable_compilation_cache(str(tmp_path / "rt"))
    # Persist even fast compiles for the test.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        @jax.jit
        def f(x):
            return jnp.tanh(x) @ x.T

        f(jnp.ones((64, 32))).block_until_ready()
        entries = list((tmp_path / "rt").iterdir())
        assert entries, "no cache entry written"
    finally:
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prev_size
        )
