"""Phase-level timing of the global engine's lock-step iteration.

Runs the dense synthetic through intake up to the trace stage, then times
the gengine sub-phases (setup relaxes, ball relax, rail relax, chase,
crop-argmax, one fused iteration) as separate jits on live state. Usage:

  python notes/prof_gengine.py [N]

Writes human-readable timings to stdout.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from kimimaro_tpu import gengine
from kimimaro_tpu.ops import gsweep
from kimimaro_tpu.ops.fused_trace import RELAX_ROUNDS

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
labels = bench.synthetic_volume_dense(N)

TEASAR = {
    "scale": 1.5, "const": 300, "pdrf_exponent": 4, "pdrf_scale": 100000,
    "soma_detection_threshold": 1100, "soma_acceptance_threshold": 3500,
}
ANIS = (16.0, 16.0, 40.0)


def t(fn, *args, reps=3, warm=1, **kw):
    for _ in range(warm):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


# --- preamble (device CCL + EDT), mirroring intake
from kimimaro_tpu.ops.ccl import compact_cc, connected_components, label_info
from kimimaro_tpu.ops import edt as edt_ops

labels_dev = jnp.asarray(labels.astype(np.uint16))
sec, cc_raw = t(lambda v: connected_components(v), labels_dev, reps=1)
print(f"ccl: {sec*1000:.1f} ms")
cc_dev, n_comp, rep_prefix = compact_cc(cc_raw)
n_components = int(n_comp)
sec, dbf_dev = t(
    lambda v: edt_ops.edt(v, anisotropy=ANIS, black_border=False), cc_dev,
    reps=2)
print(f"edt: {sec*1000:.1f} ms")
print(f"N={N} components={n_components}")

counts, bbmin, bbmax, orig = jax.device_get(label_info(
    cc_dev, labels_dev,
    n_max=1 << max(int(np.ceil(np.log2(max(n_components, 2)))), 1),
    rep_prefix=rep_prefix))
n_cap = n_components + 1
dmax = jnp.zeros((n_cap,), jnp.float32).at[
    cc_dev.ravel().astype(jnp.int32) % n_cap].max(dbf_dev.ravel())
dbfmax_arr = np.asarray(jax.device_get(dmax))

jobs = []
for s in range(1, n_components + 1):
    if counts[s] <= 1000:
        continue
    mn = np.asarray(bbmin[s], dtype=np.int64)
    shape = np.asarray(bbmax[s], dtype=np.int64) - mn + 1
    jobs.append({"segid": s, "offset": mn, "shape": shape, "before": [],
                 "after": [], "root": None, "count": int(counts[s]),
                 "dbfmax": float(dbfmax_arr[s])})
print(f"jobs={len(jobs)}")

anis = ANIS
vol_shape = tuple(int(x) for x in cc_dev.shape)
tiers = gengine._tier_crops(vol_shape)
crop_max = tiers[-1]

pool = [j for j in jobs
        if all(int(a) <= c for a, c in zip(j["shape"], crop_max))
        and float(j["dbfmax"]) <= 1100]

by_tier = [[] for _ in tiers]
for j in pool:
    for ti, c in enumerate(tiers):
        if all(int(s) <= cc for s, cc in zip(j["shape"], c)):
            by_tier[ti].append(j)
            break
groups_l = []
lane_jobs = []
for ti, c in enumerate(tiers):
    b = gengine._lane_bucket(len(by_tier[ti]))
    start = len(lane_jobs)
    lane_jobs.extend(by_tier[ti])
    lane_jobs.extend([None] * (b - len(by_tier[ti])))
    groups_l.append((start, start + b, c))
groups = tuple(groups_l)
Njobs = len(lane_jobs)
live = np.array([j is not None for j in lane_jobs])
print(f"groups={groups} lanes={Njobs} live={int(live.sum())}")

lids = np.array([j["segid"] if j else 0 for j in lane_jobs], np.int32)
offs = np.zeros((Njobs, 3), np.int32)
crop_of = np.empty((Njobs, 3), dtype=np.int64)
for (a, b, c) in groups:
    crop_of[a:b] = np.asarray(c)
for i, j in enumerate(lane_jobs):
    if j is None:
        continue
    off = np.minimum(np.asarray(j["offset"]), np.asarray(vol_shape) - crop_of[i])
    offs[i] = np.maximum(off, 0)

fv_flat = np.asarray(jax.device_get(jnp.searchsorted(
    rep_prefix, jnp.arange(1, n_components + 1, dtype=jnp.int32))))
fv_flat = np.minimum(fv_flat, labels.size - 1)
firstvox_arr = np.zeros((n_components + 1, 3), np.int32)
firstvox_arr[1:] = np.stack(np.unravel_index(fv_flat, vol_shape), axis=-1)
firstvox = np.where(live[:, None], firstvox_arr[lids], 0)

cc_x = cc_dev.astype(jnp.int32)
cc_y = jnp.transpose(cc_x, gsweep._PERM_TO_Y)
cc_z = jnp.transpose(cc_y, gsweep._PERM_Y_TO_Z)
cc16 = cc_x.astype(jnp.uint16)
cc_pad = jnp.pad(cc16, 1, constant_values=0)
dbf = dbf_dev.astype(jnp.float32)
lids_d = jnp.asarray(lids)
offs_d = jnp.asarray(offs)
live_d = jnp.asarray(live)

r_main = RELAX_ROUNDS

sec, (probe, mask, n_chg) = t(
    gengine._probe_phase, cc_x, cc_y, cc_z, jnp.asarray(firstvox), live_d,
    anis, r_main)
print(f"probe_phase ({r_main}+1 rounds): {sec*1000:.1f} ms  n_chg={int(n_chg)}")

sec, (roots, daf, mask, n_chg) = t(
    gengine._root_daf_phase, probe, cc_x, cc_y, cc_z, cc16, offs_d, lids_d,
    jnp.zeros((Njobs, 3), jnp.int32), jnp.zeros((Njobs,), bool), live_d,
    groups, anis, r_main)
print(f"root_daf_phase: {sec*1000:.1f} ms  n_chg={int(n_chg)}")

m_table = np.zeros(gengine._pow2_at_least(int(lids.max()) + 1), np.float32)
for i, job in enumerate(lane_jobs):
    if job is None:
        continue
    m_table[lids[i]] = 1.0 / np.power(max(float(job["dbfmax"]), 1e-30), 1.01)

sec, (daf, pdrf, d_rail, mask, n_chg) = t(
    gengine._pdrf_rail_phase, daf, dbf, jnp.asarray(m_table),
    cc_x, cc_y, cc_z, cc16, offs_d, lids_d, roots, live_d,
    jnp.float32(100000.0), groups, anis, r_main, 4)
print(f"pdrf_rail_phase: {sec*1000:.1f} ms  n_chg={int(n_chg)}")

# --- sub-phase jits on live state
import functools

INF = gengine.INF


@functools.partial(jax.jit, static_argnames=("groups",))
def argmax_only(packed, cc16, offs, lids, groups):
    return gengine._grouped_argmax(packed, cc16, offs, lids, groups)


valid = (cc_x > 0).astype(jnp.uint8)
packed = jnp.where(valid != 0, daf, -INF)
sec, (am_xyz, am_val) = t(argmax_only, packed, cc16, offs_d, lids_d, groups)
print(f"grouped_argmax: {sec*1000:.1f} ms")

targets = np.asarray(jax.device_get(am_xyz))

L = max(2 * sum(crop_max), 64)


@functools.partial(jax.jit, static_argnames=("L",))
def code_chase_only(d_rail, cc_x, starts, L):
    code = gengine._descent_code(d_rail, cc_x)
    return gengine._chase_codes(code.ravel(), starts, L, d_rail.shape)


sec, (path_flat, plen, reached) = t(
    code_chase_only, d_rail, cc_x, jnp.asarray(targets), L)
plens = np.asarray(jax.device_get(plen))
print(f"descent-code chase (L={L}): {sec*1000:.1f} ms  "
      f"plen p50={np.percentile(plens,50):.0f} "
      f"p90={np.percentile(plens,90):.0f} max={plens.max()}")

r_ball = max(3, r_main // 2)
r_warm = max(2, r_main // 3)


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds"))
def ball_only(pf, pmask, valid, dbf, cc_x, cc_y, cc_z, anisotropy, rounds):
    vol_shape = dbf.shape
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    radii = 1.5 * dbf.ravel()[pf] + 300.0
    ball0 = jnp.full(vol_shape, INF, dtype=jnp.float32).ravel()
    ball0 = ball0.at[pf].min(jnp.where(pmask, -radii, INF))
    ball0 = ball0.reshape(vol_shape)
    ok = valid.ravel().at[pf].max(pmask.astype(valid.dtype)).reshape(vol_shape)
    ok_v = gsweep.MaskViews(ok)
    ball_d, ball_mask = gsweep.relax_full(
        ball0, cc_v, None, ok_v, anisotropy, rounds, mode="euclid",
        clamp_positive=True, conv="negative", return_mask=True)
    return ball_d, ball_mask


pmask = (jnp.arange(L)[None, :] < plen[:, None])
pf = jnp.where(pmask, path_flat, 0)
sec, (ball_d, ball_mask) = t(
    ball_only, pf, pmask, valid, dbf, cc_x, cc_y, cc_z, anis, r_ball)
print(f"ball relax ({r_ball}+1 rounds): {sec*1000:.1f} ms "
      f"nchg={int(jnp.sum(ball_mask))}")


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds"))
def rail_only(pf, pmask, pdrf, d_rail, cc_x, cc_y, cc_z, anisotropy, rounds):
    vol_shape = pdrf.shape
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    zero = jnp.where(pmask, 0.0, INF)
    pdrf = pdrf.ravel().at[pf].min(zero).reshape(vol_shape)
    d_rail = d_rail.ravel().at[pf].min(zero).reshape(vol_shape)
    nc_v = gsweep.MaskViews(pdrf)
    d2, rail_mask = gsweep.relax_full(
        d_rail, cc_v, nc_v, None, anisotropy, rounds, mode="node",
        return_mask=True)
    return d2, rail_mask


sec, (d2, rail_mask) = t(
    rail_only, pf, pmask, pdrf, d_rail, cc_x, cc_y, cc_z, anis, r_warm)
print(f"rail relax ({r_warm}+1 rounds): {sec*1000:.1f} ms "
      f"nchg={int(jnp.sum(rail_mask))}")

# --- one full fused lock-step iteration (the real per-iteration cost)
K_ITER = gengine.K_ITER
T_CAP = gengine.T_CAP
iter_statics = dict(
    groups=groups, anisotropy=anis, r_ball=r_ball, r_warm=r_warm,
    fix_branching=True, L=L)

state = dict(
    valid=valid, pdrf=pdrf, d_rail=d_rail,
    nb=jnp.zeros((Njobs,), jnp.int32), na=jnp.zeros((Njobs,), jnp.int32),
    done=jnp.asarray(~live),
    path_buf=jnp.full((K_ITER, Njobs, L), -1, dtype=jnp.int32),
    len_buf=jnp.zeros((K_ITER, Njobs, 3), dtype=jnp.int16),
)
before_d = jnp.zeros((Njobs, T_CAP, 3), jnp.int32)
after_d = jnp.zeros((Njobs, T_CAP, 3), jnp.int32)
mp_d = jnp.full((Njobs,), K_ITER + 1, jnp.int32)

t0 = time.perf_counter()
outs = gengine._iteration(
    state["valid"], state["pdrf"], state["d_rail"], state["nb"],
    state["na"], state["done"], state["path_buf"], state["len_buf"],
    jnp.int32(0), jnp.int32(0), daf, dbf, cc_x, cc_y, cc_z, cc16, offs_d, lids_d, roots,
    before_d, after_d, mp_d, jnp.float32(1.5), jnp.float32(300.0),
    **iter_statics)
jax.block_until_ready(outs)
print(f"fused _iteration (incl compile): {time.perf_counter()-t0:.1f} s")
(valid2, pdrf2, d_rail2, nb2, na2, done2, path_buf2, len_buf2,
 stats, ball_d_o, ok_o) = outs
t0 = time.perf_counter()
outs2 = gengine._iteration(
    valid2, pdrf2, d_rail2, nb2, na2, done2, path_buf2, len_buf2,
    jnp.int32(1), jnp.int32(1), daf, dbf, cc_x, cc_y, cc_z, cc16, offs_d, lids_d, roots,
    before_d, after_d, mp_d, jnp.float32(1.5), jnp.float32(300.0),
    **iter_statics)
jax.block_until_ready(outs2)
print(f"fused _iteration (warm): {time.perf_counter()-t0:.3f} s  "
      f"stats={np.asarray(jax.device_get(outs2[8]))}")
print("done")
