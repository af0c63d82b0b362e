"""Cross-sectional area tests.

Oracles from reference automated_test.py:512-527,588-604 (solid cube exact
10000 at 100^3 — here 40^3 -> 1600; 3x3 bar -> 9) plus a numerical oracle
for the plane-box area kernel against the float64 corner-inclusion-
exclusion formula.
"""

import numpy as np
import pytest

import kimimaro_tpu
from kimimaro_tpu.ops.xsarea import box_plane_area
from kimimaro_tpu.skeleton import Skeleton


def corner_formula_area(t, n, s):
    """Exact plane-box area via the inclusion-exclusion derivative formula
    in float64 (reference semantics; numerically unstable in f32 — that is
    why the production kernel uses the sorted box-spline form)."""
    n = np.asarray(n, dtype=np.float64)
    s = np.asarray(s, dtype=np.float64)
    # avoid exact zeros for the reference formula
    n = np.where(np.abs(n) < 1e-9, 1e-9, n)
    n = n / np.linalg.norm(n)
    corners = np.array(
        [[i, j, k] for i in (-0.5, 0.5) for j in (-0.5, 0.5) for k in (-0.5, 0.5)]
    ) * s
    total = 0.0
    for c in corners:
        sign = (-1.0) ** np.sum(c > 0)
        x = t - np.dot(n, c)
        total += sign * max(0.0, x) ** 2
    return abs(total / (2.0 * n[0] * n[1] * n[2]))


@pytest.mark.parametrize("seed", range(5))
def test_box_plane_area_random(seed):
    rng = np.random.RandomState(seed)
    s = (1.0, 1.0, 1.0)
    for _ in range(20):
        n = rng.randn(3)
        n[np.abs(n) < 0.15] += 0.3  # keep the oracle formula stable
        n /= np.linalg.norm(n)
        t = rng.uniform(-1.0, 1.0)
        ref = corner_formula_area(t, n, s)
        got = float(box_plane_area(np.float32(t), np.asarray(n, np.float32), s))
        assert abs(got - ref) < 5e-3 * max(1.0, ref), (t, n, ref, got)


def test_box_plane_area_axis():
    s = (1.0, 1.0, 1.0)
    # axis-aligned plane through center: area = 1 exactly
    assert float(box_plane_area(np.float32(0.0), np.array([1, 0, 0], np.float32), s)) == 1.0
    # past the face: 0
    assert float(box_plane_area(np.float32(0.6), np.array([1, 0, 0], np.float32), s)) == 0.0
    # anisotropic box
    s = (16.0, 16.0, 40.0)
    a = float(box_plane_area(np.float32(0.0), np.array([1, 0, 0], np.float32), s))
    assert abs(a - 16.0 * 40.0) < 1e-2


def test_cross_sectional_area_bar():
    # 3x3 bar -> area 9 everywhere (reference automated_test.py:512-527)
    labels = np.ones((40, 3, 3), dtype=bool)
    vertices = np.array([[x, 1, 1] for x in range(labels.shape[0])])
    edges = np.array([[x, x + 1] for x in range(labels.shape[0] - 1)])
    skel = Skeleton(vertices, edges, segid=1)

    skel = kimimaro_tpu.cross_sectional_area_single(
        labels, skel, smoothing_window=5
    )
    assert len(skel.cross_sectional_area) == 40
    assert np.all(skel.cross_sectional_area == 9)


def test_cross_sectional_area_cube_and_step():
    # solid cube: interior axis sections hit exactly n^2
    # (reference automated_test.py:588-604 at 100^3; 40^3 here)
    n = 40
    labels = np.ones([n, n, n], dtype=np.uint8)
    # fix_borders=True (the reference default) pins axis-aligned paths whose
    # interior sections hit exactly n^2
    skel = kimimaro_tpu.skeletonize(
        labels, teasar_params={"pdrf_exponent": 16}, fix_borders=True,
        dust_threshold=100,
    )[1]

    xsa_1 = kimimaro_tpu.cross_sectional_area(
        labels, skel, step=1
    ).cross_sectional_area.copy()
    skel.cross_sectional_area = None
    del skel.cross_sectional_area
    skel.extra_attributes = []
    xsa_10 = kimimaro_tpu.cross_sectional_area(
        labels, skel, step=10
    ).cross_sectional_area

    assert np.all(xsa_1[xsa_10 == 0] != xsa_10[xsa_10 == 0])
    assert np.all(xsa_1[xsa_10 > 0] == xsa_10[xsa_10 > 0])
    assert np.any(np.abs(xsa_1 - n * n) < 1e-1)

    terminals = skel.terminals()
    assert np.all(xsa_10[terminals] > 0)

    with pytest.raises(AssertionError):
        kimimaro_tpu.cross_sectional_area(labels, skel, step=-1)


def test_oversegment():
    labels = np.zeros((32, 8, 8), dtype=np.uint8)
    labels[2:30, 2:6, 2:6] = 1
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params={"scale": 1.5, "const": 2},
        dust_threshold=10, fix_borders=False,
    )
    new_labels, new_skels = kimimaro_tpu.oversegment(
        labels, skels, downsample=5
    )
    assert new_labels.shape == labels.shape
    assert new_labels[labels == 0].max() == 0
    n_segments = len(np.unique(new_labels)) - 1
    assert n_segments >= 2  # split into multiple territories
    skel = new_skels[1]
    assert hasattr(skel, "segments")
    assert len(skel.segments) == len(skel.vertices)
    assert np.all(skel.segments > 0)


def test_bbox_ids_native_and_device_match_scipy():
    """The fast bbox-by-id paths (native single pass, device sort) must
    agree with scipy find_objects on raw (non-renumbered) labels."""
    import scipy.ndimage as ndi

    from kimimaro_tpu import native
    from kimimaro_tpu.xsection import _id_bboxes_device

    rng = np.random.RandomState(7)
    labels = np.zeros((23, 17, 11), dtype=np.uint32)
    ids = [5, 900, 31, 77]
    for i in ids:
        c = rng.randint(0, [18, 12, 6])
        labels[c[0]: c[0] + rng.randint(2, 6),
               c[1]: c[1] + rng.randint(2, 6),
               c[2]: c[2] + rng.randint(2, 6)] = i

    present = [i for i in ids if (labels == i).any()]
    want = present + [4242]  # 4242 absent

    expected = {}
    for i in present:
        sl = ndi.find_objects(labels == i)[0]
        expected[i] = (
            np.array([s.start for s in sl]),
            np.array([s.stop - 1 for s in sl]),
        )

    for got in (native.bbox_ids(labels, want),
                _id_bboxes_device(labels, want)):
        assert got is not None
        assert set(got) == set(present)
        for i in present:
            np.testing.assert_array_equal(got[i][0], expected[i][0])
            np.testing.assert_array_equal(got[i][1], expected[i][1])

    # uint64 ids beyond the device packing range: native handles them,
    # device path declines
    big = labels.astype(np.uint64)
    big[big == 5] = 2**40
    got = native.bbox_ids(big, [2**40])
    np.testing.assert_array_equal(got[2**40][0], expected[5][0])
    assert _id_bboxes_device(big, [2**40]) is None
