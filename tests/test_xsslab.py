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


def test_sweep_method_matches_dilate():
    """The directed-sweep flood (escalation rungs) must reach the same
    fixpoint as the dilation flood: same kept component, same areas,
    same contacts — including fat sections that span most of the window
    and a serpentine (spiral wall) section."""
    from kimimaro_tpu.ops import xsslab

    shape = (48, 48, 24)
    vol = np.zeros(shape, dtype=bool)
    x, y, z = np.ogrid[:48, :48, :24]
    # fat ellipsoid spanning nearly the whole window
    vol |= (((x - 24) / 21.0) ** 2 + ((y - 24) / 19.0) ** 2
            + ((z - 12) / 9.0) ** 2) < 1.0
    # spiral wall cut into it (serpentine section)
    theta = np.arctan2(np.broadcast_to(y - 24, shape),
                       np.broadcast_to(x - 24, shape))
    rr = np.sqrt(np.broadcast_to((x - 24) ** 2, shape)
                 + np.broadcast_to((y - 24) ** 2, shape))
    wall = np.abs(rr - (4 + 14 * (theta + np.pi) / (2 * np.pi))) < 1.2
    vol &= ~wall

    rng = np.random.RandomState(7)
    fgv = np.argwhere(vol)
    verts = fgv[rng.choice(len(fgv), size=24, replace=False)].astype(np.int32)
    normals = rng.randn(24, 3).astype(np.float32)
    normals[0] = (0, 0, 1)
    normals[1] = (0.05, 0.05, 1)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    # dominant axis LAST: keep only queries already z-dominant for the
    # direct kernel comparison
    anis = (1.0, 1.0, 1.0)
    w = np.abs(normals)
    keep = w.argmax(axis=1) == 2
    verts, normals = verts[keep], normals[keep]

    pshape = tuple(xsarea._bdim(int(s)) for s in shape)
    padded = np.zeros(pshape, dtype=bool)
    padded[:48, :48, :24] = vol
    fg = jnp.asarray(padded)
    ts = jnp.asarray(np.array(shape, np.int32))

    a_d, c_d, v_d = xsslab.slab_sections_batch(
        fg, jnp.asarray(verts), jnp.asarray(normals), ts, anis,
        W=64, rounds=256, method="dilate")
    a_s, c_s, v_s = xsslab.slab_sections_batch(
        fg, jnp.asarray(verts), jnp.asarray(normals), ts, anis,
        W=64, rounds=12, method="sweep")
    a_d, c_d, v_d = map(np.asarray, (a_d, c_d, v_d))
    a_s, c_s, v_s = map(np.asarray, (a_s, c_s, v_s))
    assert v_d.all(), "dilate flood did not converge at 256 rounds"
    assert v_s.all(), "sweep flood did not converge at 12 rounds"
    np.testing.assert_array_equal(c_d, c_s)
    np.testing.assert_allclose(a_d, a_s, rtol=0, atol=0)
