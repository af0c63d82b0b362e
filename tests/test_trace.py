"""TEASAR trace core tests.

Behavioral oracles adapted from the reference automated_test.py:49-102
(square/cube diagonal) at smaller sizes suited to the CPU test backend.
"""

import jax.numpy as jnp
import numpy as np

from kimimaro_tpu import trace as trace_mod
from kimimaro_tpu.ops import edt as edt_ops

TEASAR_PARAMS = dict(
    scale=1.5,
    const=300,
    pdrf_scale=100000,
    pdrf_exponent=4,
    soma_acceptance_threshold=3500,
    soma_detection_threshold=750,
    soma_invalidation_const=300,
    soma_invalidation_scale=2,
)


def multi_label_dbf(labels, anisotropy=(1, 1, 1)):
    """DBF exactly as intake computes it (black_border only if single label)."""
    labels = jnp.asarray(labels)
    single = bool((labels != 0).all())
    return edt_ops.edt(labels, anisotropy, black_border=single)


def test_square_diagonal():
    # solid square with opposite corners knocked out -> exact diagonal
    # (reference automated_test.py:49-88, at 100x100)
    n = 100
    labels = np.ones((n, n, 1), dtype=np.uint8)
    labels[-1, 0, 0] = 0
    labels[0, -1, 0] = 0

    dbf = multi_label_dbf(labels)
    dbf = jnp.where(jnp.asarray(labels) != 0, dbf, 0.0)

    skel = trace_mod.trace(labels, dbf, **TEASAR_PARAMS)

    assert skel.vertices.shape[0] == n
    assert skel.edges.shape[0] == n - 1
    assert abs(skel.cable_length() - (n - 1) * np.sqrt(2)) < 1e-3

    # other diagonal
    labels = np.ones((n, n, 1), dtype=np.uint8)
    labels[0, 0, 0] = 0
    labels[-1, -1, 0] = 0
    dbf = multi_label_dbf(labels)
    dbf = jnp.where(jnp.asarray(labels) != 0, dbf, 0.0)
    skel = trace_mod.trace(labels, dbf, **TEASAR_PARAMS)
    assert skel.vertices.shape[0] == n
    assert abs(skel.cable_length() - (n - 1) * np.sqrt(2)) < 1e-3


def test_cube_diagonal():
    # (reference automated_test.py:90-102, at 32^3)
    n = 32
    labels = np.ones((n, n, n), dtype=np.uint8)
    labels[0, 0, 0] = 0
    labels[-1, -1, -1] = 0

    dbf = multi_label_dbf(labels)
    dbf = jnp.where(jnp.asarray(labels) != 0, dbf, 0.0)
    skel = trace_mod.trace(labels, dbf, scale=1.5, const=300, pdrf_scale=100000,
                           pdrf_exponent=4)

    assert skel.vertices.shape[0] == n
    assert skel.edges.shape[0] == n - 1
    assert abs(skel.cable_length() - (n - 1) * np.sqrt(3)) < 1e-3


def test_radii_are_dbf():
    n = 20
    labels = np.ones((n, n, 1), dtype=np.uint8)
    labels[0, 0, 0] = 0
    labels[-1, -1, 0] = 0
    dbf = multi_label_dbf(labels)
    dbf = jnp.where(jnp.asarray(labels) != 0, dbf, 0.0)
    skel = trace_mod.trace(labels, dbf, **TEASAR_PARAMS)
    dbf_np = np.asarray(dbf)
    for v, r in zip(skel.vertices.astype(int), skel.radii):
        assert abs(dbf_np[v[0], v[1], v[2]] - r) < 1e-4


def test_point_to_point():
    # straight bar: path between the two ends is the straight centerline
    # (reference trace.py:358-390 / intake.connect_points)
    labels = np.zeros((40, 5, 5), dtype=np.uint8)
    labels[:, 1:4, 1:4] = 1
    skel = trace_mod.point_to_point(labels, (0, 2, 2), (39, 2, 2))
    assert skel.vertices.shape[0] == 40
    assert abs(skel.cable_length() - 39.0) < 1e-3


def test_manual_targets_before():
    n = 30
    labels = np.ones((n, n, 1), dtype=np.uint8)
    dbf = multi_label_dbf(labels)
    # single label: black border applies
    corner = (0, 0, 0)
    skel = trace_mod.trace(
        labels, dbf, root=(n - 1, n - 1, 0),
        manual_targets_before=[corner], **TEASAR_PARAMS
    )
    verts = set(map(tuple, skel.vertices.astype(int)))
    assert corner in verts


def test_max_paths():
    n = 30
    labels = np.ones((n, n, 1), dtype=np.uint8)
    dbf = multi_label_dbf(labels)
    skel = trace_mod.trace(labels, dbf, scale=0.1, const=1.0,
                           pdrf_scale=100000, pdrf_exponent=4, max_paths=2)
    # with tiny invalidation the label would need many paths; capped at 2
    comps = skel.components()
    assert len(comps) >= 1
    # cannot assert exact path count from the skeleton, but it must be small
    assert skel.vertices.shape[0] < n * n
