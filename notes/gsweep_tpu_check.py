"""Validate ops.gsweep's Pallas kernels on the axon TPU against the scan
form, size-incrementally (the worker wedges on bad kernels; find out at
64^3, not 512^3)."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from kimimaro_tpu.ops import gsweep

ANIS = (16.0, 16.0, 40.0)


def check(S, rounds=3, mode="euclid", clamp=False, with_ok=False):
    rng = np.random.RandomState(0)
    vol = rng.randint(0, 50, size=(S, S, max(S // 2, 8))).astype(np.int32)
    vol[rng.rand(*vol.shape) < 0.3] = 0
    if mode == "maxflood":
        d0 = np.where(vol > 0, rng.rand(*vol.shape) * 100, -np.inf)
    else:
        d0 = np.full(vol.shape, np.inf)
        pts = rng.randint(0, min(vol.shape), size=(50, 3))
        for p in pts:
            d0[tuple(p)] = -5.0 if clamp else 0.0
    d0 = d0.astype(np.float32)
    ok = None
    if with_ok:
        okm = ((rng.rand(*vol.shape) < 0.8) & (vol > 0)).astype(np.uint8)
        for p in pts:
            okm[tuple(p)] = 1
        ok = gsweep.MaskViews(jnp.asarray(okm))

    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    dd = jnp.asarray(d0)
    nc = None
    if mode == "node":
        nc = gsweep.MaskViews(jnp.asarray(
            np.where(vol > 0, rng.rand(*vol.shape) * 10 + 1, np.inf)
            .astype(np.float32)))

    conv_kw = dict(conv="negative") if clamp else {}

    t0 = time.perf_counter()
    gsweep._FORCE = "pallas"
    out_p, conv_p = gsweep.relax_full(dd, cc_v, nc, ok, ANIS, rounds,
                                      mode=mode, clamp_positive=clamp,
                                      **conv_kw)
    out_p = np.asarray(jax.device_get(out_p))
    t1 = time.perf_counter()

    gsweep._FORCE = "scan"
    out_s, conv_s = gsweep.relax_full(dd, cc_v, nc, ok, ANIS, rounds,
                                      mode=mode, clamp_positive=clamp,
                                      **conv_kw)
    out_s = np.asarray(jax.device_get(out_s))
    gsweep._FORCE = None
    t2 = time.perf_counter()

    match = np.array_equal(out_p, out_s) or np.allclose(
        np.nan_to_num(out_p, posinf=1e30, neginf=-1e30),
        np.nan_to_num(out_s, posinf=1e30, neginf=-1e30))
    print(f"S={S} mode={mode} clamp={clamp} ok={with_ok}: "
          f"match={match} conv=({bool(conv_p)},{bool(conv_s)}) "
          f"pallas={t1-t0:.1f}s scan={t2-t1:.1f}s", flush=True)
    if not match:
        bad = np.nonzero(out_p != out_s)
        print("  first mismatches:", [
            (tuple(int(a[i]) for a in bad), float(out_p[tuple(a[i] for a in bad)]),
             float(out_s[tuple(a[i] for a in bad)]))
            for i in range(min(3, len(bad[0])))][:3])
        sys.exit(1)


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    check(S, mode="euclid")
    check(S, mode="node")
    check(S, mode="euclid", clamp=True, with_ok=True)
    check(S, mode="maxflood")
    print("ALL OK", flush=True)
