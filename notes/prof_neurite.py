"""Diagnose the neurite-workload slowness on TPU.

Runs skeletonize on the cached neurite 512^3 volume with compile logging
and gengine debug on, so stderr shows whether the >13-min warm run is
XLA compiles (fresh shapes despite quantization) or actual trace work
(more iterations / taints / crop-engine fallbacks).
"""
import os
import sys
import time

os.environ.setdefault("KIMIMARO_TPU_GENGINE_DEBUG", "1")

import numpy as np
import jax

jax.config.update("jax_log_compiles", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import kimimaro_tpu
from kimimaro_tpu.utils import profiling

vol_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        ".bench_cache", "neurite_512_0.npy")
labels = np.load(vol_path)
print(f"volume loaded: {labels.shape} {labels.dtype}, "
      f"{len(np.unique(labels))} raw labels", file=sys.stderr, flush=True)

teasar_params = {
    "scale": 1.5, "const": 300, "pdrf_exponent": 4, "pdrf_scale": 100000,
    "soma_detection_threshold": 1100, "soma_acceptance_threshold": 3500,
}

for tag in ("warm", "timed"):
    profiling.reset_stats()
    profiling.collect(True)
    t0 = time.perf_counter()
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=teasar_params, anisotropy=(16, 16, 40),
        dust_threshold=1000, fix_borders=True, fix_branching=True,
        progress=False)
    dt = time.perf_counter() - t0
    profiling.collect(False)
    stats = profiling.get_stats()
    print(f"[{tag}] {dt:.1f}s, {len(skels)} skels", file=sys.stderr,
          flush=True)
    print(f"[{tag}] phases: "
          f"{ {k: round(v, 2) for k, v in stats['phases'].items()} }",
          file=sys.stderr, flush=True)
    print(f"[{tag}] counters: {stats['counters']}", file=sys.stderr,
          flush=True)
