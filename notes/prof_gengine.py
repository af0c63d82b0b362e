"""Phase-level timing of the global engine's lock-step iteration.

Runs the dense synthetic through intake up to the trace stage, then times
the gengine sub-phases (setup relaxes, ball relax, rail relax, chase,
crop-argmax) as separate jits on live state. Usage:

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
cc_raw = connected_components(labels_dev)
cc_dev, n_comp, rep_prefix = compact_cc(cc_raw)
n_components = int(n_comp)
dbf_dev = edt_ops.edt(cc_dev, anisotropy=ANIS, black_border=False)
dbf_dev.block_until_ready()
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
crop = gengine._pick_crop(jobs, vol_shape)
print(f"crop={crop}")

eligible = [j for j in jobs
            if all(int(a) <= c for a, c in zip(j["shape"], crop))
            and float(j["dbfmax"]) <= 1100]
Njobs = len(eligible)
lids = np.array([j["segid"] for j in eligible], np.int32)
offs = np.array([np.minimum(np.maximum(j["offset"], 0),
                            np.asarray(vol_shape) - np.asarray(crop))
                 for j in eligible], np.int32)
print(f"eligible={Njobs}")

fv_flat = np.asarray(jax.device_get(jnp.searchsorted(
    rep_prefix, jnp.arange(1, n_components + 1, dtype=jnp.int32))))
fv_flat = np.minimum(fv_flat, labels.size - 1)
firstvox_arr = np.zeros((n_components + 1, 3), np.int32)
firstvox_arr[1:] = np.stack(np.unravel_index(fv_flat, vol_shape), axis=-1)
firstvox = firstvox_arr[lids]

cc_x = cc_dev.astype(jnp.int32)
cc_y = jnp.transpose(cc_x, gsweep._PERM_TO_Y)
cc_z = jnp.transpose(cc_y, gsweep._PERM_Y_TO_Z)
cc16 = cc_x.astype(jnp.uint16)
cc_pad = jnp.pad(cc16, 1, constant_values=0)
dbf = dbf_dev.astype(jnp.float32)
lids_d = jnp.asarray(lids)
offs_d = jnp.asarray(offs)

r_main = 6

sec, (probe, mask, n_chg) = t(
    gengine._probe_phase, cc_x, cc_y, cc_z, jnp.asarray(firstvox),
    anis, r_main)
print(f"probe_phase ({r_main}+1 rounds): {sec*1000:.1f} ms  n_chg={int(n_chg)}")

sec, (roots, daf, mask, n_chg) = t(
    gengine._root_daf_phase, probe, cc_x, cc_y, cc_z, cc16, offs_d, lids_d,
    jnp.zeros((Njobs, 3), jnp.int32), jnp.zeros((Njobs,), bool),
    crop, anis, r_main)
print(f"root_daf_phase: {sec*1000:.1f} ms  n_chg={int(n_chg)}")

m_table = np.zeros(int(lids.max()) + 1, dtype=np.float32)
for j, job in zip(lids, eligible):
    m_table[j] = 1.0 / np.power(max(float(job["dbfmax"]), 1e-30), 1.01)

sec, (daf, pdrf, d_rail, mask, n_chg) = t(
    gengine._pdrf_rail_phase, daf, dbf, jnp.asarray(m_table),
    cc_x, cc_y, cc_z, cc16, offs_d, lids_d, roots, crop, anis, r_main,
    4, jnp.float32(100000.0))
print(f"pdrf_rail_phase: {sec*1000:.1f} ms  n_chg={int(n_chg)}")

# --- sub-phase jits on live state
import functools

INF = gengine.INF


@functools.partial(jax.jit, static_argnames=("crop",))
def argmax_only(packed, cc16, offs, lids, crop):
    return gengine._crop_argmax(packed, cc16, offs, lids, crop)


valid = (cc_x > 0).astype(jnp.uint8)
packed = jnp.where(valid != 0, daf, -INF)
sec, (am_idx, am_val) = t(argmax_only, packed, cc16, offs_d, lids_d, crop)
print(f"crop_argmax: {sec*1000:.1f} ms")

targets = np.asarray(jax.device_get(
    gengine._unflatten_crop(am_idx, offs_d, crop)))


@functools.partial(jax.jit, static_argnames=("L",))
def chase_only(d_rail, cc_pad, starts, lids, L):
    d_pad = jnp.pad(d_rail, 1, constant_values=INF)
    return gengine._chase_global(d_pad, cc_pad, starts, lids, L,
                                 d_rail.shape)


L = max(2 * sum(crop), 64)
sec, (path_flat, plen, reached) = t(
    chase_only, d_rail, cc_pad, jnp.asarray(targets), lids_d, L)
plens = np.asarray(jax.device_get(plen))
print(f"chase (L={L}): {sec*1000:.1f} ms  plen p50={np.percentile(plens,50):.0f} "
      f"p90={np.percentile(plens,90):.0f} max={plens.max()}")


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
    ball_only, pf, pmask, valid, dbf, cc_x, cc_y, cc_z, anis, 3)
print(f"ball relax (3+1 rounds): {sec*1000:.1f} ms "
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
    rail_only, pf, pmask, pdrf, d_rail, cc_x, cc_y, cc_z, anis, 2)
print(f"rail relax (2+1 rounds): {sec*1000:.1f} ms "
      f"nchg={int(jnp.sum(rail_mask))}")

# one full fused iteration for reference
it_args = None
print("done")
