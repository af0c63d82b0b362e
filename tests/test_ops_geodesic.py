import heapq

import numpy as np

from kimimaro_tpu.ops import geodesic
from kimimaro_tpu.ops.stencils import neighborhood_offsets

OFFS = neighborhood_offsets(26)


def dijkstra_oracle(ok, sources, anisotropy=(1, 1, 1), node_cost=None):
    """Plain heap Dijkstra on the 26-connected voxel grid."""
    ok = np.asarray(ok, dtype=bool)
    dist = np.full(ok.shape, np.inf, dtype=np.float64)
    heap = []
    for s, d0 in sources:
        s = tuple(s)
        if dist[s] > d0:
            dist[s] = d0
            heapq.heappush(heap, (d0, s))
    costs = {
        o: np.sqrt(sum((oo * w) ** 2 for oo, w in zip(o, anisotropy))) for o in OFFS
    }
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist[v]:
            continue
        for o in OFFS:
            u = (v[0] + o[0], v[1] + o[1], v[2] + o[2])
            if any(c < 0 or c >= s for c, s in zip(u, ok.shape)):
                continue
            if not ok[u]:
                continue
            if node_cost is not None:
                nd = d + node_cost[u]
            else:
                nd = d + costs[o]
            if nd < dist[u]:
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return dist


def test_euclidean_distance_free_space():
    ok = np.ones((10, 12, 8), dtype=bool)
    got = np.asarray(geodesic.euclidean_distance_field(ok, (0, 0, 0)))
    want = dijkstra_oracle(ok, [((0, 0, 0), 0.0)])
    assert np.allclose(got, want, atol=1e-4)


def test_euclidean_distance_anisotropic():
    ok = np.ones((8, 8, 8), dtype=bool)
    aniso = (1.0, 2.0, 4.0)
    got = np.asarray(geodesic.euclidean_distance_field(ok, (4, 4, 4), aniso))
    want = dijkstra_oracle(ok, [((4, 4, 4), 0.0)], aniso)
    assert np.allclose(got, want, atol=1e-4)


def test_geodesic_around_wall():
    """A U-shaped corridor forces direction reversals (multi-round fixpoint)."""
    ok = np.zeros((20, 20, 1), dtype=bool)
    ok[:, 0:2, 0] = True  # bottom corridor
    ok[18:20, :, 0] = True  # right corridor
    ok[:, 18:20, 0] = True  # top corridor
    got = np.asarray(geodesic.euclidean_distance_field(ok, (0, 0, 0)))
    want = dijkstra_oracle(ok, [((0, 0, 0), 0.0)])
    assert np.allclose(got[ok], want[ok], atol=1e-3)
    assert np.all(np.isinf(got[~ok]))


def test_node_cost_mode():
    rng = np.random.default_rng(11)
    ok = np.ones((9, 9, 3), dtype=bool)
    field = rng.uniform(0.5, 5.0, size=ok.shape).astype(np.float32)
    src = (0, 0, 0)
    init = np.full(ok.shape, np.inf, dtype=np.float32)
    init[src] = 0.0
    got = np.asarray(geodesic.distance_field(ok, init, node_cost=field))
    want = dijkstra_oracle(ok, [(src, 0.0)], node_cost=field)
    assert np.allclose(got, want, atol=1e-3)


def test_parent_field_walk_reaches_root():
    ok = np.ones((12, 10, 6), dtype=bool)
    ok[5, :8, :] = False  # wall with a gap
    src = (0, 0, 0)
    dist = geodesic.euclidean_distance_field(ok, src)
    parents = np.asarray(geodesic.parent_field(dist, ok))
    dist = np.asarray(dist)

    # walk from the farthest voxel back to the root
    finite = np.where(np.isfinite(dist), dist, -1)
    far = np.unravel_index(np.argmax(finite), dist.shape)
    v = far
    for _ in range(10000):
        code = parents[v]
        if code == 26:
            break
        o = OFFS[code]
        v = (v[0] + o[0], v[1] + o[1], v[2] + o[2])
    assert v == src


def test_return_max_location():
    ok = np.ones((10, 4, 4), dtype=bool)
    dist, target = geodesic.euclidean_distance_field(
        ok, (0, 0, 0), return_max_location=True
    )
    target = tuple(int(t) for t in target)
    assert target == (9, 3, 3)


def test_invalidation_ball_basic():
    ok = np.ones((15, 15, 15), dtype=bool)
    dbf = np.ones(ok.shape, dtype=np.float32)
    # ball of radius 3 around the center
    inv = np.asarray(
        geodesic.invalidation_ball(ok, dbf, [(7, 7, 7)], scale=0.0, const=3.0)
    )
    assert inv[7, 7, 7]
    assert inv[7, 7, 9]  # distance 2 <= 3
    assert not inv[7, 7, 11]  # distance 4 > 3
    assert not inv[0, 0, 0]


def test_invalidation_ball_stays_in_component():
    # two slabs separated by background: ball cannot jump the gap
    ok = np.zeros((11, 5, 5), dtype=bool)
    ok[0:4] = True
    ok[7:11] = True
    dbf = np.ones(ok.shape, dtype=np.float32)
    inv = np.asarray(
        geodesic.invalidation_ball(ok, dbf, [(1, 2, 2)], scale=0.0, const=100.0)
    )
    assert np.all(inv[0:4][ok[0:4]])
    assert not np.any(inv[7:11])


def test_flood_fill_hole():
    ok = np.zeros((10, 10, 10), dtype=bool)
    ok[3:7, 3:7, 3:7] = True  # cavity region as traversable
    seed = np.zeros_like(ok)
    seed[3, 3, 3] = True
    reached = np.asarray(geodesic.flood_fill(seed, ok, connectivity=6))
    assert np.array_equal(reached, ok)
