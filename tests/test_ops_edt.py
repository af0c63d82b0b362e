import numpy as np
import pytest
import scipy.ndimage

from kimimaro_tpu.ops import edt as edt_ops


def scipy_binary_edt(binimg, anisotropy=(1, 1, 1), black_border=False):
    if black_border:
        padded = np.pad(binimg, 1, constant_values=0)
        d = scipy.ndimage.distance_transform_edt(padded, sampling=anisotropy)
        slices = tuple(slice(1, -1) for _ in range(binimg.ndim))
        return d[slices]
    return scipy.ndimage.distance_transform_edt(binimg, sampling=anisotropy)


def test_binary_edt_isotropic():
    rng = np.random.default_rng(42)
    binimg = (rng.random((24, 20, 16)) > 0.4).astype(np.uint8)
    got = np.asarray(edt_ops.edt(binimg))
    want = scipy_binary_edt(binimg)
    assert np.allclose(got, want, atol=1e-4)


def test_binary_edt_anisotropic():
    rng = np.random.default_rng(1)
    binimg = (rng.random((16, 18, 10)) > 0.3).astype(np.uint8)
    aniso = (2.0, 1.0, 4.0)
    got = np.asarray(edt_ops.edt(binimg, anisotropy=aniso))
    want = scipy_binary_edt(binimg, anisotropy=aniso)
    assert np.allclose(got, want, atol=1e-3)


def test_binary_edt_black_border():
    binimg = np.ones((12, 12, 12), dtype=np.uint8)
    got = np.asarray(edt_ops.edt(binimg, black_border=True))
    want = scipy_binary_edt(binimg, black_border=True)
    assert np.allclose(got, want, atol=1e-4)


def test_multilabel_edt_matches_per_label_binary():
    """Multi-label semantics: distance for label L = binary EDT of (labels==L)
    (other labels are background), cf. reference intake.py:174-185."""
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 4, size=(20, 18, 14)).astype(np.uint32)
    aniso = (1.0, 2.0, 1.5)
    got = np.asarray(edt_ops.edt(labels, anisotropy=aniso))

    want = np.zeros(labels.shape, dtype=np.float64)
    for lab in np.unique(labels):
        if lab == 0:
            continue
        mask = labels == lab
        want[mask] = scipy_binary_edt(mask, anisotropy=aniso)[mask]

    assert np.allclose(got, want, atol=1e-3)


def test_multilabel_adjacent_labels_distance_one():
    labels = np.zeros((8, 8, 8), dtype=np.uint32)
    labels[:4] = 1
    labels[4:] = 2
    got = np.asarray(edt_ops.edt(labels))
    # voxels at the interface see the other label as background
    assert np.allclose(got[3], 1.0)
    assert np.allclose(got[4], 1.0)
    # interiors grow away from the interface (no black border -> interface only)
    assert np.all(got[0] > got[3])


def test_background_is_zero():
    labels = np.zeros((6, 6, 6), dtype=np.uint32)
    labels[2:4, 2:4, 2:4] = 5
    got = np.asarray(edt_ops.edt(labels))
    assert np.all(got[labels == 0] == 0)
    assert np.all(got[labels == 5] > 0)


def test_2d_plane_volume():
    binimg = np.ones((10, 10, 1), dtype=np.uint8)
    binimg[0, 0, 0] = 0
    got = np.asarray(edt_ops.edt(binimg))
    want = scipy_binary_edt(binimg)
    assert np.allclose(got, want, atol=1e-4)
