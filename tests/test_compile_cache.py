"""Persistent compilation cache plumbing (utils/compile_cache.py)."""

import pytest

pytestmark = pytest.mark.quick

import os

import jax
import jax.numpy as jnp

from pixelwiseregression_tpu.utils import compile_cache as cc


def _reset():
    cc._enabled_path = None
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # jax pins the cache singleton to the first directory it initialized
    # with; drop it so a dir change in this process takes effect
    try:
        from jax._src import compilation_cache as _jcc

        _jcc.reset_cache()
    except Exception:
        pass


def test_enable_writes_entries(tmp_path):
    _reset()  # other tests (CLI e2e) may have enabled the default dir
    try:
        path = cc.enable_compile_cache(str(tmp_path))
        # entries land in a per-host-CPU-fingerprint subdir: jax's cache
        # key ignores host machine features, and a CPU AOT executable
        # cached on another machine loads here with SIGILL warnings
        assert path == os.path.join(str(tmp_path), cc._host_tag())
        # idempotent: second call returns the already-enabled dir even if
        # asked for another path (config is process-global)
        assert cc.enable_compile_cache("/elsewhere") == path
        # drop the persistence threshold so a small compile is stored
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

        @jax.jit
        def f(x):
            return jax.lax.conv_general_dilated(
                x, jnp.ones((3, 3, 4, 8), x.dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        f(jnp.ones((2, 16, 16, 4))).block_until_ready()
        assert len(os.listdir(path)) > 0, "no cache entries written"
    finally:
        _reset()


def test_env_optout(tmp_path, monkeypatch):
    try:
        monkeypatch.setenv("PWR_COMPILE_CACHE", "0")
        assert cc.enable_compile_cache(str(tmp_path)) is None
    finally:
        _reset()


def test_args_optout(tmp_path):
    class A:
        no_compile_cache = True

    try:
        assert cc.maybe_enable_from_args(A()) is None
    finally:
        _reset()
