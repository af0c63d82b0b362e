"""A/B the CCL phase-2 escalation (jump vs sweep) on the winding-neurite
512^3 volume — the workload where the 134M-element pointer-jump gathers
were suspected to dominate the 13.3 s ccl phase (notes/tpu_queue.md).

Usage:  python notes/prof_ccl_ab.py [N] [reps]
"""
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench
from kimimaro_tpu.ops.ccl import connected_components

signal.alarm(1500)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
labels = bench.synthetic_volume_neurite(N).astype(np.uint16)

# axon caveats: identical dispatches on identical buffers dedup, so every
# timed rep gets its own uploaded volume (one corner background voxel set
# to a fresh singleton id — adds one component, perturbs nothing else);
# and block_until_ready is unreliable over the tunnel, so every sync is a
# scalar fetch.
variants = []
for i in range(REPS + 1):
    v = labels.copy()
    v[0, 0, i] = 60000 + i
    variants.append(v)

for mode in ("jump", "sweep", "jump"):
    os.environ["KIMIMARO_TPU_CCL_PHASE2"] = mode
    times = []
    for i, v in enumerate(variants):
        ld = jnp.asarray(v)
        int(jax.device_get(ld[0, 0, 0]))
        t0 = time.perf_counter()
        out = connected_components(ld)
        int(jax.device_get(out[0, 0, 0]))
        times.append(time.perf_counter() - t0)
        del ld, out
    # first entry is the warm/compile run
    print(f"phase2={mode}: warm={times[0]:.2f}s "
          f"timed={['%.2f' % t for t in times[1:]]} s", flush=True)
os.environ.pop("KIMIMARO_TPU_CCL_PHASE2", None)
