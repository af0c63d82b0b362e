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


def check_escalated(S):
    """relax_escalated (cond-gated on-device extra rounds) must equal a
    deep relax_full fixpoint — exercises lax.cond on the axon backend
    (while_loops miscompile there; conds must be validated on hardware)."""
    rng = np.random.RandomState(1)
    vol = rng.randint(0, 30, size=(S, S, max(S // 2, 8))).astype(np.int32)
    vol[rng.rand(*vol.shape) < 0.3] = 0
    d0 = np.full(vol.shape, np.inf, dtype=np.float32)
    pts = rng.randint(0, min(vol.shape), size=(20, 3))
    for p in pts:
        d0[tuple(p)] = 0.0
    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    dd = jnp.asarray(d0)

    import functools

    @functools.partial(jax.jit, static_argnames=("rounds", "stages"))
    def esc(d, rounds, stages):
        out, mask = gsweep.relax_escalated(d, cc_v, None, None, ANIS,
                                           rounds, extra_stages=stages,
                                           extra_rounds=2)
        return out, jnp.sum(mask, dtype=jnp.int32)

    # base rounds=1 forces the cond branches to actually run
    out_e, n_chg = esc(dd, 1, 4)
    out_e = np.asarray(jax.device_get(out_e))
    deep, _ = gsweep.relax_full(dd, cc_v, None, None, ANIS, 12)
    deep = np.asarray(jax.device_get(deep))
    match = np.array_equal(
        np.nan_to_num(out_e, posinf=1e30),
        np.nan_to_num(deep, posinf=1e30))
    print(f"S={S} escalated(1+4x2) vs deep(12): match={match} "
          f"residual n_chg={int(n_chg)}", flush=True)
    if not match:
        sys.exit(1)


check_escalated(64)
print("ESCALATED OK", flush=True)
