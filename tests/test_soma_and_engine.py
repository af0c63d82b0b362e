"""Soma-mode behavior and engine-vs-host-trace equivalence.

The reference has no soma unit test (soma params appear only in its
benchmark driver); these pin the device implementations of hole-fill +
re-EDT + soma root + radius culling, and guard the batched engine against
drift from the host trace loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import kimimaro_tpu
from kimimaro_tpu import engine, trace as trace_mod
from kimimaro_tpu.ops import edt as edt_ops
from kimimaro_tpu.skeleton import Skeleton


def ball(n, r, center=None):
    c = np.asarray(center if center is not None else (n // 2,) * 3)
    g = np.indices((n, n, n)).transpose(1, 2, 3, 0)
    return (np.sum((g - c) ** 2, axis=-1) <= r * r).astype(np.uint8)


def test_soma_mode_culls_center():
    n = 32
    labels = ball(n, 12)
    skels = kimimaro_tpu.skeletonize(
        labels,
        teasar_params={
            "scale": 1.5, "const": 2,
            "pdrf_scale": 100000, "pdrf_exponent": 4,
            "soma_detection_threshold": 5,
            "soma_acceptance_threshold": 10,
            "soma_invalidation_scale": 0.5,
            "soma_invalidation_const": 0,
        },
        dust_threshold=10, fix_borders=False,
    )
    skel = skels[1].voxel_space()
    assert not skel.empty()
    center = np.array([n // 2] * 3)
    d = np.linalg.norm(skel.vertices - center, axis=1)
    # soma culling keeps the root anchor but removes other near-center
    # vertices (soma_radius = 0.5 * dbf_max ~ 8)
    near = np.sum(d < 4.0)
    assert near <= 1


def test_soma_hole_fill_triggers():
    # a hollow ball: the cavity must be filled before the soma decision,
    # raising dbf_max (reference trace.py:104-119)
    n = 32
    labels = ball(n, 12) & ~ball(n, 4)
    skels = kimimaro_tpu.skeletonize(
        labels.astype(np.uint8),
        teasar_params={
            "scale": 1.5, "const": 2,
            "pdrf_scale": 100000, "pdrf_exponent": 4,
            "soma_detection_threshold": 5,
            "soma_acceptance_threshold": 10,
        },
        dust_threshold=10, fix_borders=False,
    )
    assert 1 in skels and not skels[1].empty()


@pytest.mark.parametrize("fix_branching", (True, False))
def test_engine_matches_host_trace(fix_branching):
    # an L-shaped tube: multiple paths, a branch point
    labels = np.zeros((40, 40, 8), dtype=np.uint8)
    labels[4:36, 18:22, 2:6] = 1
    labels[18:22, 4:36, 2:6] = 1

    params = dict(scale=1.5, const=4, pdrf_scale=100000, pdrf_exponent=4,
                  soma_detection_threshold=1100,
                  soma_acceptance_threshold=3500)

    # host loop
    dbf = edt_ops.edt(labels, (1, 1, 1))
    dbf = jnp.where(jnp.asarray(labels) != 0, dbf, 0.0)
    host_skel = trace_mod.trace(
        labels, dbf, anisotropy=(1, 1, 1), fix_branching=fix_branching,
        **params,
    )

    # engine (crop = whole volume)
    cc_dev = jnp.asarray(labels.astype(np.int32))
    jobs = [{
        "segid": 1, "offset": np.zeros(3, dtype=np.int64),
        "shape": np.array(labels.shape, dtype=np.int64),
        "before": [], "after": [], "root": None,
    }]
    results, fallback = engine.trace_batched(
        cc_dev, jnp.asarray(dbf), jobs, params, (1, 1, 1), fix_branching
    )
    assert not fallback
    eng_skel = engine.paths_to_skeleton(results[1], (1, 1, 1))

    assert Skeleton.equivalent(host_skel, eng_skel)
    # radii agree per vertex
    hv = {tuple(v): r for v, r in zip(host_skel.vertices.astype(int),
                                      host_skel.radii)}
    for v, r in zip(eng_skel.vertices.astype(int), eng_skel.radii):
        assert abs(hv[tuple(v)] - r) < 1e-4


def test_banded_edt_exactness_flag():
    """VERDICT r2 item 4: the in-kernel banded EDT must FLAG truncation
    (object thicker than the band), not silently return wrong distances."""
    labels = ball(32, 13)
    anis = (1.0, 1.0, 1.0)

    d_wide, ok_wide = jax.jit(
        lambda l: engine._crop_edtsq_banded(l, anis, jnp.bool_(False),
                                            band_cap=31)
    )(jnp.asarray(labels))
    assert bool(ok_wide)
    ref = edt_ops.edtsq(labels, anisotropy=anis)
    np.testing.assert_allclose(
        np.asarray(d_wide), np.asarray(ref), rtol=1e-5, atol=1e-3)

    d_thin, ok_thin = jax.jit(
        lambda l: engine._crop_edtsq_banded(l, anis, jnp.bool_(False),
                                            band_cap=4)
    )(jnp.asarray(labels))
    assert not bool(ok_thin)


def test_soma_thicker_than_band_escalates(monkeypatch):
    """A refilled soma thicker than the EDT band must reach the host
    fallback (flagged escalation), and the result must match the
    default-band run."""
    from kimimaro_tpu.utils import profiling

    n = 33  # unique shape: forces a fresh kernel trace under the env band
    labels = ball(n, 13)
    labels[n // 2, n // 2, n // 2] = 0  # interior hole: refill takes
    params = {
        "scale": 1.5, "const": 2,
        "pdrf_scale": 100000, "pdrf_exponent": 4,
        "soma_detection_threshold": 5,
        "soma_acceptance_threshold": 10,
        "soma_invalidation_scale": 0.5,
        "soma_invalidation_const": 0,
    }
    expected = kimimaro_tpu.skeletonize(
        labels, teasar_params=params, dust_threshold=10, fix_borders=False)

    monkeypatch.setenv("KIMIMARO_TPU_EDT_BAND", "4")
    profiling.reset_stats()
    profiling.collect(True)
    try:
        got = kimimaro_tpu.skeletonize(
            labels, teasar_params=params, dust_threshold=10,
            fix_borders=False)
    finally:
        profiling.collect(False)
    counters = profiling.get_stats()["counters"]

    assert counters.get("fallback_jobs", 0) >= 1, (
        f"banded-EDT truncation did not escalate: {counters}")
    assert sorted(got) == sorted(expected)
    va = np.array(sorted(map(tuple, expected[1].vertices.tolist())))
    vb = np.array(sorted(map(tuple, got[1].vertices.tolist())))
    np.testing.assert_allclose(va, vb, atol=1e-4)


def test_batched_finalize_matches_per_label():
    """paths_to_skeletons_batched must reproduce the per-label
    paths_to_skeleton semantics exactly: consecutive-dup fusion, vertex
    dedup, undirected edge dedup, disconnected-vertex removal,
    last-write-wins radii (reference trace.py:182-193)."""
    import numpy as np

    from kimimaro_tpu import engine

    rng = np.random.RandomState(5)
    results = {}
    offsets = {}
    for segid in (3, 11, 42, 1000):
        paths = []
        for _ in range(rng.randint(1, 5)):
            n = rng.randint(1, 12)
            # random walk with occasional repeats (consecutive dups) and
            # revisits (shared vertices across paths)
            steps = rng.randint(-1, 2, size=(n, 3))
            steps[rng.rand(n) < 0.3] = 0
            verts = np.cumsum(steps, axis=0) + rng.randint(0, 4, size=3)
            rads = rng.uniform(0.5, 5.0, size=n).astype(np.float32)
            paths.append((verts.astype(np.int64), rads))
        results[segid] = paths
        offsets[segid] = rng.randint(0, 50, size=3).astype(np.int64)

    aniso = (16.0, 16.0, 40.0)
    got = engine.paths_to_skeletons_batched(results, offsets, aniso)
    assert got is not None

    for segid, paths in results.items():
        ref = engine.paths_to_skeleton(paths, aniso)
        if ref.empty():
            assert segid not in got
            continue
        ref.vertices += offsets[segid].astype(np.float32)
        g = got[segid]
        assert len(g.vertices) == len(ref.vertices), segid
        np.testing.assert_allclose(
            np.sort(g.vertices.view("f4").reshape(-1, 3), axis=0),
            np.sort(ref.vertices, axis=0), err_msg=str(segid))
        # same vertex order (consolidate's sorted order) -> same arrays
        np.testing.assert_array_equal(g.vertices, ref.vertices)
        np.testing.assert_array_equal(g.radii, ref.radii)
        ge = {tuple(sorted(e)) for e in g.edges.tolist()}
        re_ = {tuple(sorted(e)) for e in ref.edges.tolist()}
        assert ge == re_, segid
