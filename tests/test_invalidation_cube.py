"""Cube invalidation fuzz tests vs a pure-python geometric oracle
(reference automated_test.py:632-825 strategy)."""

import numpy as np
import pytest

from kimimaro_tpu.ops.geodesic import invalidation_cube


def oracle(labels, dbf, path, scale, const, anisotropy):
    labels = labels.copy()
    w = np.asarray(anisotropy, dtype=np.float32)
    shape = labels.shape
    mask = np.zeros(shape, dtype=bool)
    g = np.indices(shape).transpose(1, 2, 3, 0).astype(np.float32)
    for v in path:
        r = scale * dbf[tuple(v)] + const
        box = np.ones(shape, dtype=bool)
        for a in range(3):
            box &= np.abs(g[..., a] - v[a]) <= r / w[a]
        mask |= box
    n = int(np.count_nonzero(labels[mask]))
    labels[mask] = 0
    return n, labels


@pytest.mark.parametrize("seed", range(8))
def test_invalidation_cube_fuzz(seed):
    rng = np.random.RandomState(seed)
    shape = tuple(rng.randint(6, 14, size=3))
    labels = (rng.rand(*shape) < 0.7).astype(np.uint8)
    dbf = rng.uniform(0, 4, size=shape).astype(np.float32) * labels
    npath = rng.randint(1, 4)
    path = np.stack(
        [rng.randint(0, s, size=npath) for s in shape], axis=1
    )
    scale = float(rng.uniform(0.5, 2.0))
    const = float(rng.uniform(0.0, 2.0))
    anis = tuple(rng.uniform(0.5, 2.0, size=3))

    n_ref, lab_ref = oracle(labels, dbf, path, scale, const, anis)
    n_got, lab_got = invalidation_cube(labels, dbf, path, scale, const, anis)

    assert int(n_got) == n_ref
    assert np.array_equal(np.asarray(lab_got), lab_ref)


def test_invalidation_cube_fuzz_wide():
    """100 seeded fixtures (reference automated_test.py:632-825 scale).

    Shape and path length are FIXED so all iterations share one compiled
    program — the randomized coverage lives in the data (labels density,
    DBF magnitudes, path positions, scale/const, anisotropy), keeping the
    whole sweep comfortably inside the suite budget."""
    shape = (11, 9, 13)
    anis_menu = [(1, 1, 1), (0.5, 1.3, 2.0), (2.0, 2.0, 0.7), (16, 16, 40)]
    for seed in range(100):
        rng = np.random.RandomState(1000 + seed)
        labels = (rng.rand(*shape) < rng.uniform(0.3, 0.9)).astype(np.uint8)
        dbf = rng.uniform(0, 5, size=shape).astype(np.float32) * labels
        path = np.stack(
            [rng.randint(0, s, size=3) for s in shape], axis=1
        )
        scale = float(rng.uniform(0.0, 2.5))
        const = float(rng.uniform(0.0, 3.0))
        anis = anis_menu[seed % len(anis_menu)]

        n_ref, lab_ref = oracle(labels, dbf, path, scale, const, anis)
        n_got, lab_got = invalidation_cube(
            labels, dbf, path, scale, const, anis)

        assert int(n_got) == n_ref, f"seed {seed}: count mismatch"
        assert np.array_equal(np.asarray(lab_got), lab_ref), f"seed {seed}"


def _ball_oracle(ok, dbf, path, scale, const, anisotropy):
    """Brute in-component rolling-ball oracle: voxel x is invalidated iff
    some path vertex v has geodesic_dist(v, x) <= scale*DBF[v]+const, where
    the geodesic runs over 26-connected foreground steps in physical units
    (reference dijkstra_invalidation.hpp:239-332 semantics, incl. sources
    re-enabled even if a previous ball already cleared them)."""
    from scipy import sparse
    from scipy.sparse import csgraph

    ok = ok.astype(bool).copy()
    pv = np.asarray(path, dtype=np.int64).reshape(-1, 3)
    radii = scale * dbf[pv[:, 0], pv[:, 1], pv[:, 2]] + const
    ok[pv[:, 0], pv[:, 1], pv[:, 2]] = True

    shape = ok.shape
    n = int(np.prod(shape))
    idx = np.arange(n).reshape(shape)
    rows, cols, dists = [], [], []
    w = np.asarray(anisotropy, dtype=np.float64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) == (0, 0, 0):
                    continue
                src = tuple(
                    slice(max(0, -d), s - max(0, d))
                    for d, s in zip((dx, dy, dz), shape))
                dst = tuple(
                    slice(max(0, d), s - max(0, -d))
                    for d, s in zip((dx, dy, dz), shape))
                m = ok[src] & ok[dst]
                rows.append(idx[src][m])
                cols.append(idx[dst][m])
                step = np.sqrt(((np.array([dx, dy, dz]) * w) ** 2).sum())
                dists.append(np.full(m.sum(), step))
    g = sparse.csr_matrix(
        (np.concatenate(dists), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n))
    src_idx = np.ravel_multi_index((pv[:, 0], pv[:, 1], pv[:, 2]), shape)
    d = csgraph.dijkstra(g, indices=src_idx)
    hit = (d <= radii[:, None] + 1e-6).any(axis=0)
    return hit.reshape(shape) & ok


def test_invalidation_ball_fuzz_vs_brute_oracle():
    """100-seed fuzz of the multi-source capped relaxation against a
    scipy-dijkstra brute oracle (VERDICT r3 item 10): in-component
    semantics, per-source radii from DBF, anisotropic steps."""
    from kimimaro_tpu.ops.geodesic import invalidation_ball

    shape = (10, 11, 9)
    anis_menu = [(1, 1, 1), (0.8, 1.4, 1.0), (2.0, 1.0, 0.6)]
    for seed in range(100):
        rng = np.random.RandomState(7000 + seed)
        ok = rng.rand(*shape) < rng.uniform(0.45, 0.95)
        dbf = rng.uniform(0, 3, size=shape).astype(np.float32) * ok
        npath = 3
        path = np.stack(
            [rng.randint(0, s, size=npath) for s in shape], axis=1)
        scale = float(rng.uniform(0.0, 1.5))
        # keep radii continuous so exact dist==radius ties have measure 0
        const = float(rng.uniform(0.3, 3.1))
        anis = anis_menu[seed % len(anis_menu)]

        want = _ball_oracle(ok, dbf, path, scale, const, anis)
        got = np.asarray(
            invalidation_ball(ok, dbf, path, scale, const, anis))
        assert np.array_equal(got, want), (
            f"seed {seed}: {int(got.sum())} vs oracle {int(want.sum())}")


def test_invalidation_cube_clamps_at_borders():
    labels = np.ones((5, 5, 5), dtype=np.uint8)
    dbf = np.ones((5, 5, 5), dtype=np.float32)
    n, out = invalidation_cube(labels, dbf, [(0, 0, 0)], 1.0, 0.0, (1, 1, 1))
    assert int(n) == 8  # 2x2x2 corner box
    assert np.asarray(out)[0, 0, 0] == 0
    assert np.asarray(out)[2, 2, 2] == 1
