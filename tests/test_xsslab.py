"""The O(plane) slab sectioning kernel must reproduce the dense 3D
kernel exactly: same closed-form per-cell areas, same 26-connected
component selection, same face-contact bits (reference semantics:
xs3d.cross_sectional_area, /root/reference/kimimaro/utility.py:315-334)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kimimaro_tpu.ops import xsarea


def _dense_reference(binimg, verts, normals, anisotropy):
    """Drive the dense 3D kernel directly (the pre-slab code path)."""
    shape = binimg.shape
    pshape = tuple(xsarea._bdim(int(s)) for s in shape)
    padded = np.zeros(pshape, dtype=bool)
    padded[: shape[0], : shape[1], : shape[2]] = binimg != 0
    def rung(rounds):
        return lambda fg, v, m, ts, an: xsarea._sections_batch(
            fg, v, m, ts, an, rounds=rounds)

    return xsarea._run_batches(
        [rung(r) for r in (8, 48, 192)], jnp.asarray(padded),
        jnp.asarray(np.array(shape, np.int32)),
        np.asarray(verts, np.int32), np.asarray(normals, np.float32),
        tuple(float(a) for a in anisotropy), 64)


def _blobs(seed, shape=(22, 19, 17)):
    rng = np.random.RandomState(seed)
    vol = np.zeros(shape, dtype=bool)
    x, y, z = np.ogrid[: shape[0], : shape[1], : shape[2]]
    for _ in range(3):
        c = rng.randint(3, np.array(shape) - 3)
        r = rng.randint(3, 8, size=3)
        vol |= (((x - c[0]) / r[0]) ** 2 + ((y - c[1]) / r[1]) ** 2
                + ((z - c[2]) / r[2]) ** 2) < 1.0
    return vol


@pytest.mark.parametrize("seed,anisotropy", [
    (1, (1.0, 1.0, 1.0)),
    (2, (16.0, 16.0, 40.0)),
    (3, (4.0, 1.0, 11.0)),
])
def test_slab_matches_dense_random_normals(seed, anisotropy):
    vol = _blobs(seed)
    rng = np.random.RandomState(seed + 100)
    fgv = np.argwhere(vol)
    verts = fgv[rng.choice(len(fgv), size=40, replace=False)]
    normals = rng.randn(40, 3).astype(np.float32)
    # include axis-aligned and near-diagonal normals among the random ones
    normals[0] = (1, 0, 0)
    normals[1] = (0, 1, 0)
    normals[2] = (0, 0, 1)
    normals[3] = (1, 1, 1)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)

    a_slab, c_slab = xsarea.cross_section_areas(
        vol, verts, normals, anisotropy)
    a_dense, c_dense = _dense_reference(vol, verts, normals, anisotropy)

    np.testing.assert_allclose(a_slab, a_dense, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(c_slab, c_dense)


def test_degenerate_normal_falls_back():
    vol = _blobs(7)
    verts = np.argwhere(vol)[:3]
    normals = np.zeros((3, 3), np.float32)  # zero normals: dense path
    a, c = xsarea.cross_section_areas(vol, verts, normals, (1, 1, 1))
    a_d, c_d = _dense_reference(vol, verts, normals, (1, 1, 1))
    np.testing.assert_allclose(a, a_d, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(c, c_d)
