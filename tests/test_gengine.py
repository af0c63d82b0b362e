"""The global full-volume engine must reproduce the batched crop engine's
skeletons exactly (same fields by ops.gsweep equivalence, same argmax
tie-break order, same chase and invalidation semantics)."""

import os

import numpy as np
import pytest

import kimimaro_tpu


TEASAR = {
    "scale": 1.5,
    "const": 30,
    "pdrf_exponent": 4,
    "pdrf_scale": 100000,
    "soma_detection_threshold": 1e9,  # keep every label global-eligible
    "soma_acceptance_threshold": 1e9,
}


def _blob_volume(seed=0, shape=(40, 36, 30), n_seeds=6):
    """Several irregular 26-connected blobs (random growth from seeds;
    asymmetric so DAF/probe argmaxes are tie-free)."""
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


def _skels(vol, enabled, **kw):
    os.environ["KIMIMARO_TPU_GLOBAL_ENGINE"] = "1" if enabled else "0"
    try:
        return kimimaro_tpu.skeletonize(
            vol, teasar_params=TEASAR, anisotropy=(16, 16, 40),
            dust_threshold=10, progress=False, **kw)
    finally:
        os.environ.pop("KIMIMARO_TPU_GLOBAL_ENGINE", None)


def _assert_same(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        sa, sb = a[k], b[k]
        va = sa.vertices[np.lexsort(sa.vertices.T)]
        vb = sb.vertices[np.lexsort(sb.vertices.T)]
        np.testing.assert_array_equal(va, vb)
        # edges as canonical vertex-coordinate pairs
        def edge_set(s):
            v = s.vertices
            es = set()
            for e in s.edges:
                p, q = tuple(v[e[0]]), tuple(v[e[1]])
                es.add((min(p, q), max(p, q)))
            return es
        assert edge_set(sa) == edge_set(sb)
        ra = {tuple(v): r for v, r in zip(sa.vertices, sa.radii)}
        rb = {tuple(v): r for v, r in zip(sb.vertices, sb.radii)}
        for v in ra:
            assert ra[v] == rb[v]


def test_global_matches_crop_engine_basic():
    vol = _blob_volume(seed=1)
    a = _skels(vol, True, fix_borders=False)
    b = _skels(vol, False, fix_borders=False)
    assert len(a) >= 3
    _assert_same(a, b)


def test_global_matches_with_fix_borders():
    vol = _blob_volume(seed=2)
    vol[:3] = 0
    vol[0, 10:20, 10:18] = 7  # touching the border -> border targets
    vol[1, 10:20, 10:18] = 7
    vol[2, 11:19, 11:17] = 7
    a = _skels(vol, True, fix_borders=True)
    b = _skels(vol, False, fix_borders=True)
    _assert_same(a, b)


def test_global_matches_fix_branching_false():
    vol = _blob_volume(seed=3)
    a = _skels(vol, True, fix_branching=False, fix_borders=False)
    b = _skels(vol, False, fix_branching=False, fix_borders=False)
    _assert_same(a, b)


def test_global_matches_with_max_paths():
    vol = _blob_volume(seed=4)
    tp = dict(TEASAR, max_paths=2)
    os.environ["KIMIMARO_TPU_GLOBAL_ENGINE"] = "1"
    try:
        a = kimimaro_tpu.skeletonize(vol, teasar_params=tp,
                                     anisotropy=(16, 16, 40),
                                     dust_threshold=10, fix_borders=False)
    finally:
        os.environ["KIMIMARO_TPU_GLOBAL_ENGINE"] = "0"
    try:
        b = kimimaro_tpu.skeletonize(vol, teasar_params=tp,
                                     anisotropy=(16, 16, 40),
                                     dust_threshold=10, fix_borders=False)
    finally:
        os.environ.pop("KIMIMARO_TPU_GLOBAL_ENGINE", None)
    _assert_same(a, b)


def test_soma_labels_fall_through_to_crop_engine():
    """With real soma thresholds a thick blob must still skeletonize
    (routed to the crop engine) and match the global-disabled run."""
    vol = np.zeros((30, 30, 20), dtype=np.uint32)
    vol[4:26, 4:26, 4:16] = 1   # thick -> dbf_max can exceed threshold
    vol[2:6, 2:6, 2:6] = 2
    tp = dict(TEASAR, soma_detection_threshold=100,
              soma_acceptance_threshold=150,
              soma_invalidation_scale=0.5, soma_invalidation_const=0)
    os.environ["KIMIMARO_TPU_GLOBAL_ENGINE"] = "1"
    try:
        a = kimimaro_tpu.skeletonize(vol, teasar_params=tp,
                                     anisotropy=(16, 16, 40),
                                     dust_threshold=10, fix_borders=False)
    finally:
        os.environ["KIMIMARO_TPU_GLOBAL_ENGINE"] = "0"
    try:
        b = kimimaro_tpu.skeletonize(vol, teasar_params=tp,
                                     anisotropy=(16, 16, 40),
                                     dust_threshold=10, fix_borders=False)
    finally:
        os.environ.pop("KIMIMARO_TPU_GLOBAL_ENGINE", None)
    _assert_same(a, b)


def test_tiered_argmax_groups_match_crop_engine():
    """Compact labels + elongated labels land in different fixed-menu
    gather-crop tiers (the grouped static-slice path); results must equal
    the crop engine exactly."""
    from kimimaro_tpu import gengine

    vol = np.zeros((96, 72, 24), dtype=np.uint32)
    lab = 0
    # 36 small blobs (bbox ~5-6 per axis -> the 16^3 tier)
    for i in range(6):
        for j in range(6):
            lab += 1
            x, y = 2 + 16 * i, 2 + 12 * j
            vol[x:x + 5, y:y + 5, 2:7] = lab
    # 36 long tubes (bbox ~40 along x -> the 64-extent tier)
    for i in range(6):
        for j in range(6):
            lab += 1
            x, y = 4 + 15 * i, 2 + 11 * j
            vol[x:x + min(40, 96 - x), y:y + 3, 10:13] = lab

    # confirm the workload actually spans >=2 tiers of the fixed menu
    tiers = gengine._tier_crops(vol.shape)
    assert len(tiers) >= 2, tiers
    dims = np.array(
        [np.ptp(np.array(np.nonzero(vol == k)), axis=1) + 1
         for k in range(1, lab + 1)])

    def tier_of(d):
        for t, c in enumerate(tiers):
            if all(int(s) <= cc for s, cc in zip(d, c)):
                return t
        return len(tiers)

    occupied = {tier_of(d) for d in dims}
    assert len(occupied) >= 2, (occupied, tiers)

    a = _skels(vol, True, fix_borders=False)
    b = _skels(vol, False, fix_borders=False)
    assert len(a) == lab
    _assert_same(a, b)


def test_segmented_path_buffer_no_retrace(monkeypatch):
    """A label needing more paths than one K_ITER-row buffer must finish
    inside the gengine via segment drains (VERDICT r3 item 8: capacity
    used to taint the label and re-trace it in the crop engine, wasting
    the finished paths) — identical output to the crop engine, zero
    fallback jobs, >= 2 segments."""
    from kimimaro_tpu import gengine
    from kimimaro_tpu.utils import profiling

    monkeypatch.setattr(gengine, "K_ITER", 3)

    # spider: 8 thin legs off a center blob; the small-const invalidation
    # ball clears ~one leg per path, so the label needs ~8 paths > K_ITER
    vol = np.zeros((48, 48, 12), dtype=np.uint32)
    c = 24
    vol[c - 2:c + 3, c - 2:c + 3, 4:9] = 1
    for d in ((1, 0), (0, 1), (-1, 0), (0, -1),
              (1, 1), (1, -1), (-1, 1), (-1, -1)):
        for s in range(3, 17):
            vol[c + d[0] * s, c + d[1] * s, 6] = 1
    vol[2:7, 2:7, 2:7] = 2  # second label (global pass needs >= 2)

    profiling.reset_stats()
    profiling.collect(True)
    a = _skels(vol, True, fix_borders=False)
    profiling.collect(False)
    counters = profiling.get_stats()["counters"]
    b = _skels(vol, False, fix_borders=False)
    assert counters.get("gengine_fallback", 0) == 0, counters
    assert counters.get("gengine_segments", 0) >= 2, counters
    _assert_same(a, b)


def test_gengine_shapes_independent_of_label_population():
    """Compile-shape hygiene (r3 VERDICT item 3): the group structure and
    chase length must depend only on the volume shape and power-of-two
    lane buckets — never on the workload's bbox percentiles — so a second
    workload reuses the first's compiled programs."""
    from kimimaro_tpu import gengine

    # same volume shape, very different bbox distributions
    tiers = gengine._tier_crops((512, 512, 512))
    assert tiers == [(16, 16, 16), (32, 32, 32), (48, 48, 48),
                     (64, 64, 64), (96, 96, 96), (128, 128, 128),
                     (192, 192, 192), (256, 256, 256), (384, 384, 384)]
    # lane buckets quantize to powers of two (min 4)
    assert gengine._lane_bucket(0) == 4
    assert gengine._lane_bucket(3) == 4
    assert gengine._lane_bucket(5) == 8
    assert gengine._lane_bucket(1500) == 2048
    assert gengine._lane_bucket(1800) == 2048
    assert gengine._lane_bucket(2048) == 2048
    # small volumes collapse to fewer tiers (all-equal crops dedupe)
    assert gengine._tier_crops((12, 12, 8)) == [(12, 12, 8)]
