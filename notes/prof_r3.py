"""Round-3 profiling harness: capture jobs from the dense 512^3 preamble,
then time trace_batched per bucket/batch with forced synchronization."""
import os, sys, time, json
import numpy as np

os.environ.setdefault("KIMIMARO_TPU_DEBUG_ENGINE", "1")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import kimimaro_tpu
import kimimaro_tpu.engine as engine

labels = np.load("/root/repo/.bench_cache/dense_512_0.npy")

teasar_params = {
    "scale": 1.5, "const": 300, "pdrf_exponent": 4, "pdrf_scale": 100000,
    "soma_detection_threshold": 1100, "soma_acceptance_threshold": 3500,
}

captured = {}
orig_tb = engine.trace_batched

def capture(cc_dev, dbf_dev, jobs, *a, **k):
    captured.update(cc=cc_dev, dbf=dbf_dev, jobs=jobs, a=a, k=k)
    return {}, []

engine.trace_batched = capture
t0 = time.perf_counter()
kimimaro_tpu.skeletonize(
    labels, teasar_params=teasar_params, anisotropy=(16, 16, 40),
    dust_threshold=1000, fix_borders=True, fix_branching=True,
)
print(f"preamble: {time.perf_counter()-t0:.1f}s, jobs={len(captured['jobs'])}")
engine.trace_batched = orig_tb

jobs = captured["jobs"]

# --- job stats
from collections import Counter
bshapes = Counter()
for job in jobs:
    bshape = tuple(
        min(engine._bucket_dim(int(s)), 512) for s in job["shape"]
    )
    bshapes[bshape] += 1
print("bucket histogram:")
for bs, n in sorted(bshapes.items(), key=lambda kv: -kv[1]):
    print(f"  {bs}: {n} jobs, lanes={engine._lanes_for(bs, n)}")

counts = np.array([j["count"] for j in jobs])
dbfm = np.array([j["dbfmax"] or 0 for j in jobs])
nbt = np.array([len(j["before"]) for j in jobs])
print(f"count: med={np.median(counts):.0f} p90={np.percentile(counts,90):.0f} max={counts.max()}")
print(f"dbfmax: med={np.median(dbfm):.0f} p90={np.percentile(dbfm,90):.0f} max={dbfm.max():.0f}")
print(f"n_before: med={np.median(nbt):.0f} p90={np.percentile(nbt,90):.0f} max={nbt.max()}")
print(f"soma_possible(dbfmax>1100): {int((dbfm>1100).sum())}")

if os.environ.get("PROF_TIME", "1") == "1":
    # --- timed engine run with per-batch sync
    # monkeypatch batched_trace_kernel to block+time each dispatch
    orig_kernel = engine.batched_trace_kernel
    batch_times = []

    def timed_kernel(*a, **k):
        t0 = time.perf_counter()
        outs = orig_kernel(*a, **k)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        lanes = a[3].shape[0]
        batch_times.append((k["crop_shape"], lanes, dt,
                            int(np.max(jax.device_get(outs[2])))))
        return outs

    engine.batched_trace_kernel = timed_kernel
    t0 = time.perf_counter()
    results, fallback = orig_tb(
        captured["cc"], captured["dbf"], jobs, teasar_params,
        (16, 16, 40), True, progress=False,
    )
    total = time.perf_counter() - t0
    engine.batched_trace_kernel = orig_kernel
    print(f"\ntrace_batched total: {total:.1f}s, results={len(results)}, fallback={len(fallback)}")
    agg = {}
    for bs, lanes, dt, maxk in batch_times:
        a_ = agg.setdefault(bs, [0, 0.0, 0, 0])
        a_[0] += 1; a_[1] += dt; a_[2] += lanes; a_[3] = max(a_[3], maxk)
    print("per-bucket: shape -> batches, total_s, lanes_sum, max_paths_seen")
    for bs, (nb, tt, ls, mk) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {bs}: {nb} batches, {tt:.1f}s, {ls} lanes, maxk={mk}")
    # path count histogram
    nps = [len(v) for v in results.values()]
    if nps:
        print(f"paths/label: med={np.median(nps):.0f} p90={np.percentile(nps,90):.0f} max={max(nps)}")
