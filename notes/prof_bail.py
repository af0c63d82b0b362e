"""Dense 512^3 bail-threshold sweep on a quiet host (tpu_queue item 3).

Each setting gets one full skeletonize run on a fresh upload (axon dedups
identical dispatches on identical buffers; the volume is re-uploaded by
skeletonize from host numpy each run, so runs are independent).

Usage:  python notes/prof_bail.py [bail ...]   (default 40 100 200)
"""
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
import kimimaro_tpu
from kimimaro_tpu.utils import profiling

signal.alarm(2400)

bails = [int(a) for a in sys.argv[1:]] or [40, 100, 200]
labels = bench.synthetic_volume_dense(512)
TEASAR = {
    "scale": 1.5, "const": 300, "pdrf_exponent": 4, "pdrf_scale": 100000,
    "soma_detection_threshold": 1100, "soma_acceptance_threshold": 3500,
}


def run():
    profiling.reset_stats()
    profiling.collect(True)
    t0 = time.perf_counter()
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR, anisotropy=(16, 16, 40),
        dust_threshold=1000, fix_borders=True, fix_branching=True,
        progress=False)
    dt = time.perf_counter() - t0
    stats = profiling.get_stats()
    profiling.collect(False)
    return len(skels), dt, stats


# warm pass (compile/persist) at the first setting
os.environ["KIMIMARO_TPU_GENGINE_BAIL"] = str(bails[0])
n, dt, _ = run()
print(f"warm: {dt:.1f}s ({n} skels)", flush=True)

for b in bails:
    os.environ["KIMIMARO_TPU_GENGINE_BAIL"] = str(b)
    n, dt, stats = run()
    c = stats["counters"]
    print(f"bail={b}: {dt:.2f}s loop={c.get('gengine_loop_ms', 0)}ms "
          f"crop={c.get('tb_crop_engine_ms', 0)}ms "
          f"fallback={c.get('gengine_fallback', 0)} "
          f"phases={json.dumps({k: round(v, 2) for k, v in stats['phases'].items()})}",
          flush=True)
os.environ.pop("KIMIMARO_TPU_GENGINE_BAIL", None)
