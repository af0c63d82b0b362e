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
# NO persistent compilation cache for CPU test runs: the shared
# .jax_cache serves XLA:CPU AOT executables whose compile-machine
# features don't match this host ("+prefer-no-gather ... could lead to
# execution errors such as SIGILL" — two full-suite runs segfaulted in
# exactly the compile/cache paths), and measured warm-vs-cold suite
# times were equal, so the cache bought nothing here anyway. The axon
# (TPU) flows keep using .jax_cache — remote compiles need it.
