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


def test_invalidation_cube_clamps_at_borders():
    labels = np.ones((5, 5, 5), dtype=np.uint8)
    dbf = np.ones((5, 5, 5), dtype=np.float32)
    n, out = invalidation_cube(labels, dbf, [(0, 0, 0)], 1.0, 0.0, (1, 1, 1))
    assert int(n) == 8  # 2x2x2 corner box
    assert np.asarray(out)[0, 0, 0] == 0
    assert np.asarray(out)[2, 2, 2] == 1
