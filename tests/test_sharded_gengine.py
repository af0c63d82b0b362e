"""Sharded gengine equivalence (VERDICT r3 missing #4): the lock-step
trace engine over a virtual 8-device mesh must reproduce the single-chip
gengine's paths exactly — same fields (fixpoint relaxes), same argmax
tie-breaks (global flat-index lex order), same chase rows, same radii."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

N_DEV = min(8, len(jax.devices()))

TEASAR = {
    "scale": 1.5,
    "const": 30,
    "pdrf_exponent": 4,
    "pdrf_scale": 100000,
    "soma_detection_threshold": 1e9,
    "soma_acceptance_threshold": 1e9,
}
ANIS = (16.0, 16.0, 40.0)


def _blob_volume(seed=0, shape=(40, 36, 30), n_seeds=6):
    rng = np.random.RandomState(seed)
    vol = np.zeros(shape, dtype=np.uint32)
    for lab in range(1, n_seeds + 1):
        c = rng.randint(4, np.array(shape) - 4)
        r = rng.randint(3, 7, size=3)
        x, y, z = np.ogrid[:shape[0], :shape[1], :shape[2]]
        e = (((x - c[0]) / r[0]) ** 2 + ((y - c[1]) / (r[1] * 1.3)) ** 2
             + ((z - c[2]) / r[2]) ** 2)
        noise = rng.rand(*shape) * 0.4
        m = (e + noise) < 1.0
        vol[m & (vol == 0)] = lab
    return vol


def _prep(vol):
    """Shared preamble: device CCL + EDT + per-label jobs (the contract
    gengine.trace_global and trace_global_sharded both consume)."""
    from kimimaro_tpu.ops import edt as edt_ops
    from kimimaro_tpu.ops.ccl import (compact_cc, connected_components,
                                      label_info)

    labels_dev = jnp.asarray(vol)
    cc_dev, n_comp, rep_prefix = compact_cc(
        connected_components(labels_dev))
    n = int(n_comp)
    dbf_dev = edt_ops.edt(cc_dev, anisotropy=ANIS, black_border=False)
    n_max = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
    counts, bbmin, bbmax, orig, dbfmax = jax.device_get(label_info(
        cc_dev, labels_dev, n_max=n_max, rep_prefix=rep_prefix,
        dbf=dbf_dev))
    jobs = []
    for s in range(1, n + 1):
        if counts[s] < 8:
            continue
        mn = np.asarray(bbmin[s], dtype=np.int64)
        shape = np.asarray(bbmax[s], dtype=np.int64) - mn + 1
        jobs.append({"segid": s, "offset": mn, "shape": shape,
                     "before": [], "after": [], "root": None,
                     "dbfmax": float(dbfmax[s])})
    return cc_dev, dbf_dev, jobs


@pytest.mark.skipif(N_DEV < 2, reason="needs a multi-device mesh")
def test_sharded_gengine_matches_single_chip():
    from kimimaro_tpu import gengine as g1
    from kimimaro_tpu.parallel import sharded
    from kimimaro_tpu.parallel import gengine as sg

    vol = _blob_volume(seed=5)
    cc_dev, dbf_dev, jobs = _prep(vol)
    assert len(jobs) >= 3

    res1, left1 = g1.trace_global(
        cc_dev, dbf_dev, [dict(j) for j in jobs], TEASAR, ANIS, True)
    assert len(res1) >= 3

    mesh = sharded.make_mesh(N_DEV)
    cc_sh = sharded.shard_volume(cc_dev, mesh)
    dbf_sh = sharded.shard_volume(dbf_dev, mesh)
    res2, left2 = sg.trace_global_sharded(
        cc_sh, dbf_sh, [dict(j) for j in jobs], TEASAR, ANIS, True, mesh)

    assert set(res1.keys()) == set(res2.keys())
    assert len(left1) == len(left2)
    for k in res1:
        p1, p2 = res1[k], res2[k]
        assert len(p1) == len(p2), (k, len(p1), len(p2))
        for (v1, r1), (v2, r2) in zip(p1, p2):
            np.testing.assert_array_equal(v1, v2)
            np.testing.assert_allclose(r1, r2, rtol=0, atol=0)


@pytest.mark.skipif(N_DEV < 2, reason="needs a multi-device mesh")
def test_sharded_gengine_manual_targets_and_roots():
    """fix_borders-style manual targets and preset roots ride the sharded
    engine identically to the single-chip engine."""
    from kimimaro_tpu import gengine as g1
    from kimimaro_tpu.parallel import sharded
    from kimimaro_tpu.parallel import gengine as sg

    vol = _blob_volume(seed=7)
    cc_dev, dbf_dev, jobs = _prep(vol)
    # give the two largest labels a manual root + one before-target at
    # bbox corners (in-label voxels found on host)
    cc_h = np.asarray(jax.device_get(cc_dev))
    big = sorted(jobs, key=lambda j: -int(np.prod(j["shape"])))[:2]
    for j in big:
        s = j["segid"]
        vox = np.argwhere(cc_h == s)
        j["root"] = tuple(int(c) - int(m)
                          for c, m in zip(vox[0], j["offset"]))
        j["before"] = [tuple(int(c) - int(m)
                             for c, m in zip(vox[-1], j["offset"]))]

    res1, _ = g1.trace_global(
        cc_dev, dbf_dev, [dict(j) for j in jobs], TEASAR, ANIS, True)
    mesh = sharded.make_mesh(N_DEV)
    res2, _ = sg.trace_global_sharded(
        sharded.shard_volume(cc_dev, mesh),
        sharded.shard_volume(dbf_dev, mesh),
        [dict(j) for j in jobs], TEASAR, ANIS, True, mesh)

    assert set(res1.keys()) == set(res2.keys())
    for k in res1:
        assert len(res1[k]) == len(res2[k])
        for (v1, r1), (v2, r2) in zip(res1[k], res2[k]):
            np.testing.assert_array_equal(v1, v2)
            np.testing.assert_allclose(r1, r2, rtol=0, atol=0)
