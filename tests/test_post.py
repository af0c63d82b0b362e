"""Postprocess tests — ported from reference automated_test.py:335-455,
566-586, 611-630."""

import numpy as np

import kimimaro_tpu
from kimimaro_tpu import post
from kimimaro_tpu.skeleton import Skeleton


def test_find_cycle():
    edges = np.array([[0, 1], [1, 2], [2, 0], [2, 3], [2, 4]], dtype=np.int32)
    cycle = post.find_cycle(edges)
    assert len(cycle) == 4
    assert cycle[0] == cycle[-1]
    assert set(cycle) == {0, 1, 2}

    edges = np.array(
        [[0, 1], [1, 2], [2, 3],
         [3, 4], [4, 10], [10, 11], [11, 12], [12, 2],
         [4, 5], [5, 6], [6, 7]],
        dtype=np.int32,
    )
    cycle = post.find_cycle(edges)
    assert cycle[0] == cycle[-1]
    assert set(cycle) == {2, 3, 4, 10, 11, 12}

    # two loops: either is a valid answer
    edges = np.array(
        [[0, 1], [0, 20], [20, 21], [21, 22], [22, 23], [23, 21],
         [1, 2], [2, 3], [3, 4], [4, 5], [5, 6],
         [6, 7], [7, 10], [10, 11], [11, 6]],
        dtype=np.int32,
    )
    cycle = post.find_cycle(edges)
    assert cycle[0] == cycle[-1]
    assert set(cycle) in ({21, 22, 23}, {6, 7, 10, 11})

    # acyclic
    edges = np.array([[0, 1], [1, 2]], dtype=np.int32)
    assert len(post.find_cycle(edges)) == 0


def test_join_close_components_simple():
    skel = Skeleton(
        [(0, 0, 0), (1, 0, 0), (10, 0, 0), (11, 0, 0)],
        edges=[(0, 1), (2, 3)],
        radii=[0, 1, 2, 3],
        vertex_types=[0, 1, 2, 3],
        segid=1337,
    )
    assert len(skel.components()) == 2

    res = kimimaro_tpu.join_close_components(skel, radius=np.inf)
    assert len(res.components()) == 1

    res = kimimaro_tpu.join_close_components(skel, radius=9)
    assert len(res.components()) == 1
    assert np.all(res.edges == [[0, 1], [1, 2], [2, 3]])

    res = kimimaro_tpu.join_close_components(skel, radius=8.5)
    assert len(res.components()) == 2


def test_join_close_components_complex():
    skel = Skeleton(
        [(0, 0, 0), (1, 0, 0), (4, 0, 0), (6, 0, 0), (20, 0, 0), (21, 0, 0),
         (0, 0, 5), (0, 0, 10)],
        edges=[(0, 1), (2, 3), (4, 5), (6, 7)],
    )
    assert len(skel.components()) == 4

    res = kimimaro_tpu.join_close_components(skel, radius=np.inf)
    assert len(res.components()) == 1
    assert np.all(
        res.edges == [[0, 1], [0, 3], [1, 2], [3, 4], [4, 5], [5, 6], [6, 7]]
    )


def test_join_close_components_by_radius():
    skel = Skeleton(
        [(0, 0, 0), (1, 0, 0), (5, 0, 0), (11, 0, 0)],
        edges=[(0, 1), (2, 3)],
        radii=[100, 100, 100, 100],
        vertex_types=[0, 1, 2, 3],
        segid=1337,
    )

    res = kimimaro_tpu.join_close_components(skel, restrict_by_radius=False)
    assert len(res.components()) == 1
    assert np.all(res.edges == [[0, 1], [1, 2], [2, 3]])

    res = kimimaro_tpu.join_close_components(skel, restrict_by_radius=True)
    assert len(res.components()) == 1
    assert np.all(res.edges == [[0, 1], [1, 2], [2, 3]])

    skel.radii = np.array([1, 1, 1, 1], dtype=np.float32)
    res = kimimaro_tpu.join_close_components(skel, restrict_by_radius=True)
    assert len(res.components()) == 2
    assert np.all(res.edges == [[0, 1], [2, 3]])

    skel.radii = np.array([1, 0.9, 3, 1], dtype=np.float32)
    res = kimimaro_tpu.join_close_components(skel, restrict_by_radius=True)
    assert len(res.components()) == 2
    assert np.all(res.edges == [[0, 1], [2, 3]])

    skel.radii = np.array([1, 1, 3, 1], dtype=np.float32)
    res = kimimaro_tpu.join_close_components(skel, restrict_by_radius=True)
    assert len(res.components()) == 1
    assert np.all(res.edges == [[0, 1], [1, 2], [2, 3]])


def test_remove_row():
    arr = np.array([[0, 1], [1, 2], [2, 1], [2, 2], [2, 3], [3, 4]])
    result = post.remove_row(arr, np.array([[1, 2]]))
    assert np.all(result == np.array([[0, 1], [2, 2], [2, 3], [3, 4]]))

    arr = np.array([[]])
    result = post.remove_row(arr, np.array([[1, 2]]))
    assert np.all(result == np.array([]))


def test_postprocess():
    # reference automated_test.py:611-630: a trivial loop is deleted; the
    # other two segments remain
    skel = Skeleton(
        [(0, 0, 0), (1, 0, 0), (4, 0, 0), (6, 0, 0), (20, 0, 0), (21, 0, 0),
         (0, 0, 5), (0, 0, 10)],
        edges=[(0, 1), (2, 3), (4, 5), (6, 7), (0, 7), (1, 6)],
    )
    res = kimimaro_tpu.postprocess(skel, dust_threshold=0, tick_threshold=0)
    ans = Skeleton(
        [(4, 0, 0), (6, 0, 0), (20, 0, 0), (21, 0, 0)],
        edges=[(0, 1), (2, 3)],
    )
    assert Skeleton.equivalent(res, ans)


def test_remove_dust():
    skel = Skeleton(
        [(0, 0, 0), (5, 0, 0), (10, 0, 0), (100, 0, 0), (101, 0, 0)],
        edges=[(0, 1), (1, 2), (3, 4)],
    )
    res = post.remove_dust(skel, 5.0)
    assert len(res.components()) == 1
    assert res.components()[0].cable_length() == 10.0


def test_remove_ticks():
    # main line 0-1-2-3 with a short tick at 1
    skel = Skeleton(
        [(0, 0, 0), (10, 0, 0), (20, 0, 0), (30, 0, 0), (10, 1, 0)],
        edges=[(0, 1), (1, 2), (2, 3), (1, 4)],
        radii=[1, 1, 1, 1, 1],
    )
    res = post.remove_ticks(skel, threshold=5.0)
    res = res.consolidate()
    assert res.vertices.shape[0] == 4
    assert abs(res.cable_length() - 30.0) < 1e-4

    # tick longer than threshold survives
    res = post.remove_ticks(skel, threshold=0.5)
    assert res.consolidate().vertices.shape[0] == 5


def test_remove_loops_cases():
    # isolated loop -> removed entirely
    skel = Skeleton(
        [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)],
        edges=[(0, 1), (1, 2), (2, 3), (3, 0)],
        radii=[1, 1, 1, 1],
    )
    res = post.remove_loops(skel)
    assert res.consolidate().edges.shape[0] == 0

    # loop with a tail: loop removed, tail connected to farthest loop node
    skel = Skeleton(
        [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), (-1, 0, 0)],
        edges=[(0, 1), (1, 2), (2, 3), (3, 0), (0, 4)],
        radii=[1, 1, 1, 1, 1],
    )
    res = post.remove_loops(skel).consolidate()
    assert len(res.components()) == 1
    # no cycles remain
    assert len(post.find_cycle(res.edges.astype(np.int32))) == 0


def test_moving_average():
    from kimimaro_tpu.utility import moving_average

    data = np.array([])
    assert np.all(moving_average(data, 1) == data)
    assert np.all(moving_average(data, 2) == data)

    data = np.array([1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1])
    assert np.all(moving_average(data, 1) == data)
    assert np.all(moving_average(data, 2) == data)

    data = np.array([0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0])
    ans = np.array([0, 0.5, 1, 1, 1, 1, 1, 1, 1, 1, 0.5])
    assert np.all(moving_average(data, 2) == ans)

    data = np.array([0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0])
    ans = np.array([1 / 3, 1 / 3, 2 / 3, 1, 1, 1, 1, 1, 1, 1, 2 / 3])
    res = moving_average(data, 3)
    assert np.allclose(res, ans)
    assert len(res) == len(data)


def test_extract_skeleton_from_binary_image():
    img = np.zeros((10, 3, 3), dtype=bool)
    img[:, 1, 1] = True
    skel = kimimaro_tpu.extract_skeleton_from_binary_image(img)
    assert skel.vertices.shape[0] == 10
    assert skel.edges.shape[0] == 9


def test_join_close_components_sparse_equals_quadratic():
    """The finite-radius sparse path (global query_pairs + link folding)
    must produce the same joined skeleton as the radius=inf quadratic
    greedy when every gap is within radius."""
    import numpy as np

    from kimimaro_tpu.post import join_close_components
    from kimimaro_tpu.skeleton import Skeleton

    rng = np.random.RandomState(5)
    pieces = []
    for i in range(12):
        n = rng.randint(3, 9)
        base = rng.rand(3) * 50
        verts = base + np.cumsum(rng.rand(n, 3) * 1.5, axis=0)
        edges = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
        s = Skeleton(
            vertices=verts.astype(np.float32),
            edges=edges.astype(np.uint32),
            radii=rng.rand(n).astype(np.float32) + 0.2,
        )
        pieces.append(s)
    merged_all = Skeleton.simple_merge(pieces)

    got_inf = join_close_components(merged_all.clone(), radius=np.inf)
    got_big = join_close_components(merged_all.clone(), radius=1e6)
    assert got_inf.vertices.shape == got_big.vertices.shape
    assert Skeleton.equivalent(got_inf, got_big)

    # finite radius smaller than some gaps: sparse path must leave the
    # far components unjoined, exactly like a per-pair measure would
    got_small = join_close_components(merged_all.clone(), radius=3.0)
    import scipy.sparse.csgraph as csg
    import scipy.sparse as sp

    n = len(got_small.vertices)
    adj = sp.coo_matrix(
        (np.ones(len(got_small.edges)),
         (got_small.edges[:, 0], got_small.edges[:, 1])), shape=(n, n))
    ncomp, _ = csg.connected_components(adj, directed=False)
    # every remaining gap between distinct components exceeds the radius
    from scipy.spatial import cKDTree

    comps = got_small.components()
    for i in range(len(comps)):
        t = cKDTree(comps[i].vertices)
        for j in range(i + 1, len(comps)):
            d, _ = t.query(comps[j].vertices, k=1)
            assert d.min() > 3.0
