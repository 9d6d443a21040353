"""Test configuration: CPU backend with 8 virtual devices and float64 enabled.

The session environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
must run on local CPU (f64 available, no per-dispatch network latency), so we
override unconditionally before jax initializes. Multi-chip sharding paths
are exercised on the virtual 8-device CPU mesh (the driver's dryrun does the
same).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-bound (hundreds of
# distinct jit signatures); re-runs hit the on-disk cache instead.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
