"""Cross-label batched cross sections (ops.xsbatch) must agree with the
per-label bbox path (ops.xsarea via shape_iterator) — same flood
connectivity, same box-spline plane areas, same contact semantics
(reference utility.py:351-560)."""

import numpy as np
import pytest

import kimimaro_tpu
from kimimaro_tpu.ops.xsarea import cross_section_areas
from kimimaro_tpu.ops.xsbatch import cross_section_areas_volume
from kimimaro_tpu.skeleton import Skeleton


def _multi_label_volume():
    """Three disjoint tubes of different orientation + a small blob."""
    labels = np.zeros((48, 40, 36), dtype=np.uint32)
    labels[4:44, 6:10, 6:10] = 7            # x-aligned bar
    labels[10:14, 4:36, 20:24] = 900        # y-aligned bar
    labels[30:34, 28:32, 2:34] = 31         # z-aligned bar
    labels[38:46, 20:28, 22:30] = 4242      # blob
    return labels


def _xs(labels, skels, monkeypatch, batched, **kw):
    monkeypatch.setenv("KIMIMARO_TPU_XS_BATCHED", "1" if batched else "0")
    clones = {k: s.clone() for k, s in skels.items()}
    kimimaro_tpu.cross_sectional_area(labels, clones, **kw)
    return clones


@pytest.mark.parametrize("step", [1, 3])
def test_batched_matches_per_label_multilabel(monkeypatch, step):
    labels = _multi_label_volume()
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params={"scale": 1.5, "const": 2},
        dust_threshold=10, fix_borders=False)
    assert len(skels) >= 3

    ref = _xs(labels, skels, monkeypatch, batched=False, step=step)
    got = _xs(labels, skels, monkeypatch, batched=True, step=step)

    for k in ref:
        ra = ref[k].cross_sectional_area
        ga = got[k].cross_sectional_area
        np.testing.assert_allclose(ga, ra, rtol=1e-4, atol=1e-3,
                                   err_msg=f"label {k} areas")
        np.testing.assert_array_equal(
            got[k].cross_sectional_area_contacts,
            ref[k].cross_sectional_area_contacts,
            err_msg=f"label {k} contacts")


def test_batched_bool_bar(monkeypatch):
    # 3x3 bar -> area 9 everywhere (reference automated_test.py:512-527)
    labels = np.ones((40, 3, 3), dtype=bool)
    vertices = np.array([[x, 1, 1] for x in range(labels.shape[0])])
    edges = np.array([[x, x + 1] for x in range(labels.shape[0] - 1)])
    skel = Skeleton(vertices, edges, segid=1)

    monkeypatch.setenv("KIMIMARO_TPU_XS_BATCHED", "1")
    out = kimimaro_tpu.cross_sectional_area(
        labels, skel, smoothing_window=5)
    assert np.all(out.cross_sectional_area == 9)
    # the bar spans the full volume: end sections touch the x faces
    contacts = out.cross_sectional_area_contacts
    assert contacts[0] & 0b01
    assert contacts[-1] & 0b10
    # every section touches the y/z faces (bar == volume in y/z)
    assert np.all(contacts & 0b111100 == 0b111100)


def test_kernel_matches_per_label_kernel():
    """Direct kernel equality: volume-batched queries vs the per-label
    crop kernel on the same planes."""
    rng = np.random.RandomState(11)
    labels = np.zeros((30, 26, 22), dtype=np.uint32)
    labels[3:27, 4:22, 3:19] = 5
    # carve holes so sections are non-convex
    holes = rng.rand(30, 26, 22) < 0.15
    labels[holes] = 0
    anis = (1.0, 1.0, 1.0)

    # queries at foreground voxels with random normals
    fg = np.argwhere(labels == 5)
    sel = fg[rng.choice(len(fg), 24, replace=False)]
    normals = rng.randn(24, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)

    ref_a, ref_c = cross_section_areas(
        labels == 5, sel, normals, anis)
    got = cross_section_areas_volume(
        labels, sel, normals, np.full(24, 5), anis)
    assert got is not None
    got_a, got_c = got
    np.testing.assert_allclose(got_a, ref_a, rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(got_c, ref_c)


def test_absent_label_and_zero_queries():
    labels = np.ones((8, 8, 8), dtype=np.uint32)
    out = cross_section_areas_volume(
        labels, np.zeros((2, 3), np.int32),
        np.tile([[1.0, 0, 0]], (2, 1)).astype(np.float32),
        np.array([99, 99]), (1, 1, 1))
    assert out is not None
    areas, contacts = out
    np.testing.assert_array_equal(areas, 0.0)
    np.testing.assert_array_equal(contacts, 0)

    areas, contacts = cross_section_areas_volume(
        labels, np.zeros((0, 3), np.int32), np.zeros((0, 3), np.float32),
        np.zeros(0), (1, 1, 1))
    assert areas.shape == (0,) and contacts.shape == (0,)


def test_uint64_big_ids(monkeypatch):
    """64-bit ids above 2^32 can't ride the int32 equality test: the
    driver must fall back to the per-label path and still produce areas."""
    labels = np.zeros((20, 6, 6), dtype=np.uint64)
    labels[2:18, 1:5, 1:5] = 2 ** 40
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params={"scale": 1.5, "const": 2},
        dust_threshold=10, fix_borders=False)
    monkeypatch.setenv("KIMIMARO_TPU_XS_BATCHED", "1")
    out = kimimaro_tpu.cross_sectional_area(labels, skels)
    skel = out[2 ** 40]
    assert np.any(skel.cross_sectional_area > 0)
