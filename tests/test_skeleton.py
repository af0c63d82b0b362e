import numpy as np
import pytest

from kimimaro_tpu.skeleton import Skeleton


def test_from_path():
    path = [(0, 0, 0), (1, 1, 0), (2, 2, 0)]
    skel = Skeleton.from_path(path)
    assert skel.vertices.shape == (3, 3)
    assert skel.edges.shape == (2, 2)
    assert np.array_equal(skel.edges, [[0, 1], [1, 2]])


def test_from_path_dedupes_consecutive():
    path = [(0, 0, 0), (0, 0, 0), (1, 0, 0)]
    skel = Skeleton.from_path(path)
    assert skel.vertices.shape == (2, 3)
    assert skel.edges.shape == (1, 2)


def test_cable_length():
    skel = Skeleton.from_path([(0, 0, 0), (1, 1, 1), (2, 2, 2)])
    assert abs(skel.cable_length() - 2 * np.sqrt(3)) < 1e-5


def test_simple_merge_and_consolidate():
    s1 = Skeleton.from_path([(0, 0, 0), (1, 0, 0)])
    s2 = Skeleton.from_path([(1, 0, 0), (2, 0, 0)])
    merged = Skeleton.simple_merge([s1, s2])
    assert merged.vertices.shape == (4, 3)
    assert merged.edges.shape == (2, 2)

    cons = merged.consolidate()
    assert cons.vertices.shape == (3, 3)
    assert cons.edges.shape == (2, 2)
    assert len(cons.components()) == 1


def test_consolidate_removes_disconnected():
    skel = Skeleton(
        vertices=[(0, 0, 0), (1, 0, 0), (5, 5, 5)],
        edges=[(0, 1)],
    )
    cons = skel.consolidate()
    assert cons.vertices.shape == (2, 3)

    cons2 = skel.consolidate(remove_disconnected_vertices=False)
    assert cons2.vertices.shape == (3, 3)


def test_components():
    skel = Skeleton(
        vertices=[(0, 0, 0), (1, 0, 0), (10, 0, 0), (11, 0, 0)],
        edges=[(0, 1), (2, 3)],
        radii=[0, 1, 2, 3],
    )
    comps = skel.components()
    assert len(comps) == 2
    assert comps[0].vertices.shape == (2, 3)
    assert np.array_equal(comps[0].radii, [0, 1])
    assert np.array_equal(comps[1].radii, [2, 3])


def test_terminals_branches():
    # Y-shaped skeleton
    skel = Skeleton(
        vertices=[(0, 0, 0), (1, 0, 0), (2, 1, 0), (2, -1, 0)],
        edges=[(0, 1), (1, 2), (1, 3)],
    )
    assert set(skel.terminals().tolist()) == {0, 2, 3}
    assert set(skel.branches().tolist()) == {1}


def test_paths_cover_edges():
    skel = Skeleton(
        vertices=[(0, 0, 0), (1, 0, 0), (2, 1, 0), (2, -1, 0)],
        edges=[(0, 1), (1, 2), (1, 3)],
    )
    paths = skel.paths()
    assert len(paths) == 2
    total = sum(len(p) - 1 for p in paths)
    assert total == 4  # shared prefix counted twice: (0-1) x2 + 2 leaves


def test_equivalent():
    s1 = Skeleton.from_path([(0, 0, 0), (1, 0, 0), (2, 0, 0)])
    s2 = Skeleton(
        vertices=[(2, 0, 0), (0, 0, 0), (1, 0, 0)],
        edges=[(1, 2), (2, 0)],
    )
    assert Skeleton.equivalent(s1, s2)

    s3 = Skeleton.from_path([(0, 0, 0), (1, 0, 0), (3, 0, 0)])
    assert not Skeleton.equivalent(s1, s3)


def test_swc_roundtrip():
    skel = Skeleton(
        vertices=[(0, 0, 0), (1, 0, 0), (2, 1, 0), (2, -1, 0)],
        edges=[(0, 1), (1, 2), (1, 3)],
        radii=[1, 2, 3, 4],
        space="physical",
    )
    swc = skel.to_swc()
    back = Skeleton.from_swc(swc)
    assert Skeleton.equivalent(skel, back)
    r1 = sorted(skel.radii.tolist())
    r2 = sorted(back.radii.tolist())
    assert np.allclose(r1, r2)


def test_downsample():
    pts = [(float(i), 0, 0) for i in range(11)]
    skel = Skeleton.from_path(pts)
    ds = skel.downsample(2)
    # endpoints always kept
    assert ds.vertices.shape[0] < skel.vertices.shape[0]
    assert len(ds.components()) == 1
    assert abs(ds.cable_length() - skel.cable_length()) < 1e-4


def test_voxel_space():
    skel = Skeleton.from_path([(0, 0, 0), (4, 4, 40)])
    skel.transform = np.array(
        [[4, 0, 0, 0], [0, 4, 0, 0], [0, 0, 40, 0]], dtype=np.float32
    )
    phys = skel.physical_space()
    assert phys.space == "physical"
    assert np.allclose(phys.vertices[1], (16, 16, 1600))
    vox = phys.voxel_space()
    assert np.allclose(vox.vertices, skel.vertices, atol=1e-4)


def test_merge():
    s1 = Skeleton.from_path([(0, 0, 0), (1, 0, 0)])
    s2 = Skeleton.from_path([(1, 0, 0), (2, 0, 0)])
    m = s1.merge(s2)
    assert m.vertices.shape == (3, 3)
    assert len(m.components()) == 1
