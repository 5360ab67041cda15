"""Test harness: force CPU with a virtual 8-device mesh (no TPU in CI).

Must run before the first `import jax` anywhere in the test process.
"""

import os

_platform = os.environ.get("PACMANN_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: an installed TPU plugin (e.g. 'axon') can
# override JAX_PLATFORMS, so pin the platform through the config too.
jax.config.update("jax_platforms", _platform)

# Persistent compile cache: the bitsliced AES circuit is expensive to compile;
# cache it across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
