"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var cannot be overridden from here — use jax.config instead. XLA_FLAGS must
still be set before jax initializes its backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent XLA compilation cache: the suite is compile-bound (dozens of
# small UNet train/sample programs), so caching compilations across runs
# cuts wall-clock several-fold after the first run
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
