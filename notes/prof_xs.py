"""Round-3 cross-section profiling on the live backend.

Reproduces bench.py's xs measurement (dense 512^3 volume, one ~800-vertex
skeleton) with per-stage wall timings so we can see whether the 254-926
ms/vertex measured on TPU is compile cost, dispatch latency, d2h fetches,
or kernel time. axon pitfalls (see memory): block_until_ready is
unreliable -> every sync is a scalar fetch; identical dispatches dedup ->
the second timed call uses a fresh clone with identical queries (same
programs, fresh buffers).

Usage:  python notes/prof_xs.py [N]   (default 512)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
import kimimaro_tpu
from kimimaro_tpu.utils import profiling

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
labels = bench.synthetic_volume_dense(N)

TEASAR = {
    "scale": 1.5, "const": 300, "pdrf_exponent": 4, "pdrf_scale": 100000,
    "soma_detection_threshold": 1100, "soma_acceptance_threshold": 3500,
}

t0 = time.perf_counter()
skels = kimimaro_tpu.skeletonize(
    labels, teasar_params=TEASAR, anisotropy=(16, 16, 40),
    dust_threshold=1000, fix_borders=True, fix_branching=True,
    progress=False,
)
print(f"skeletonize: {time.perf_counter() - t0:.1f}s ({len(skels)} skels)",
      flush=True)

mid = sorted(skels.values(), key=lambda s: abs(len(s) - 800))[0]
print(f"xs target skeleton: id={mid.id} vertices={len(mid.vertices)}",
      flush=True)

for tag in ("warm", "timed"):
    profiling.reset_stats()
    profiling.collect(True)
    t0 = time.perf_counter()
    kimimaro_tpu.cross_sectional_area(
        labels, {mid.id: mid.clone()}, anisotropy=(16, 16, 40),
        progress=False,
    )
    dt = time.perf_counter() - t0
    stats = profiling.get_stats()
    profiling.collect(False)
    print(f"{tag}: total={dt:.2f}s "
          f"ms/vertex={1000.0 * dt / max(len(mid.vertices), 1):.2f}",
          flush=True)
    print(json.dumps(stats["counters"]), flush=True)
