"""Pytest bootstrap: force the CPU backend with a virtual 8-device mesh so
multi-chip sharding logic is exercised without TPU hardware.

NB: this environment's sitecustomize exports JAX_PLATFORMS=axon (the
tunneled TPU), overriding env vars set here — so the platform must be
forced through jax.config *after* import, before first backend use.
"""

import os

# persist lowered programs across test processes (jax.export): the suite's
# dominant cost is re-TRACING the big vmapped kernels every run — the
# XLA compile cache below can't help with that (see utils/progcache.py)
os.environ.setdefault("KIMIMARO_TPU_PROGCACHE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
# Cache EVERY compile, even sub-second ones: the suite's dominant cost is
# hundreds of small XLA:CPU programs (a profiled avocado test spent 20.2s
# of 27.3s in 363 compiles, each under the default 1.0s threshold and so
# never persisted). Threshold 0 turns those into disk hits on warm runs
# (measured 29.8s -> 5.6s on that test).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# (The XLA:CPU AOT loader sometimes warns that cached executables carry
# compile-machine features the host lacks; the full-suite segfaults once
# blamed on it were in fact vm.max_map_count exhaustion — see below —
# and cached entries execute correctly.)


def _raise_map_limit() -> bool:
    """Full-suite runs accumulate memory maps (each compiled XLA:CPU
    executable mmaps several regions); measured growth hits the default
    vm.max_map_count=65530 roughly 150 tests in, at which point LLVM's
    JIT segfaults inside compile (observed three times, always in
    backend_compile_and_load / cache-load paths). Raise the limit when
    permitted; the caller falls back to dropping compiled programs
    between modules otherwise."""
    path = "/proc/sys/vm/max_map_count"
    try:
        if int(open(path).read()) < 262144:
            with open(path, "w") as f:
                f.write("1048576")
        return int(open(path).read()) >= 262144
    except OSError:
        return False


_MAPS_OK = _raise_map_limit()

if not _MAPS_OK:
    import gc

    import pytest

    @pytest.fixture(autouse=True, scope="module")
    def _drop_compiled_programs_between_modules():
        yield
        jax.clear_caches()
        gc.collect()
