"""Round-5 xs profiling on the live backend: batched cross sections at
bench scale (>=12k vertices across many labels), reproducing bench.py's
xs stage exactly, with skeleton caching so re-measurement after a kernel
edit skips the ~25 s skeletonize.

Usage:  python notes/prof_xs5.py [budget_s]   (default 900; SIGALRM-bounded)
"""
import json
import os
import pickle
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
import kimimaro_tpu
from kimimaro_tpu.utils import profiling

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
signal.alarm(int(BUDGET))

N = 512
labels = bench.synthetic_volume_dense(N)
SKEL_CACHE = "/root/repo/.bench_cache/dense_512_skels.pkl"

if os.path.exists(SKEL_CACHE):
    with open(SKEL_CACHE, "rb") as fh:
        skels = pickle.load(fh)
    print(f"skeletons loaded from cache ({len(skels)})", flush=True)
else:
    TEASAR = {
        "scale": 1.5, "const": 300, "pdrf_exponent": 4,
        "pdrf_scale": 100000,
        "soma_detection_threshold": 1100,
        "soma_acceptance_threshold": 3500,
    }
    t0 = time.perf_counter()
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR, anisotropy=(16, 16, 40),
        dust_threshold=1000, fix_borders=True, fix_branching=True,
        progress=False,
    )
    print(f"skeletonize: {time.perf_counter() - t0:.1f}s "
          f"({len(skels)} skels)", flush=True)
    with open(SKEL_CACHE, "wb") as fh:
        pickle.dump(skels, fh)

# same selection as bench.py's xs stage
pool = sorted(skels.values(), key=len, reverse=True)
sel, nv = [], 0
for s in pool:
    sel.append(s)
    nv += len(s)
    if nv >= 12000:
        break
print(f"xs batch: {len(sel)} skeletons, {nv} vertices", flush=True)

for tag in ("warm", "timed"):
    profiling.reset_stats()
    profiling.collect(True)
    t0 = time.perf_counter()
    kimimaro_tpu.cross_sectional_area(
        labels, {s.id: s.clone() for s in sel}, anisotropy=(16, 16, 40),
        progress=False,
    )
    dt = time.perf_counter() - t0
    stats = profiling.get_stats()
    profiling.collect(False)
    print(f"{tag}: total={dt:.2f}s ms/vertex={1000.0 * dt / nv:.3f}",
          flush=True)
    print(json.dumps(stats["counters"]), flush=True)
