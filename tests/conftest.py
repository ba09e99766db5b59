"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware.

The session environment pins JAX_PLATFORMS=axon (TPU tunnel), and some
installed pytest plugins import jax before this conftest runs — so setting
the env var alone is not enough; we also update the jax config directly
(backends initialize lazily, so this wins as long as no array op ran yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU, got " + jax.default_backend()
    )
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
