"""Pytest bootstrap: force the CPU backend with a virtual 8-device mesh so
multi-chip sharding logic is exercised without TPU hardware.

NB: this environment's sitecustomize exports JAX_PLATFORMS=axon (the
tunneled TPU), overriding env vars set here — so the platform must be
forced through jax.config *after* import, before first backend use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
