import numpy as np
import scipy.ndimage

from kimimaro_tpu.ops import fill


def test_fill_simple_hole():
    binimg = np.ones((10, 10, 10), dtype=bool)
    binimg[4:6, 4:6, 4:6] = False
    filled, n = fill.fill(binimg, return_fill_count=True)
    filled = np.asarray(filled)
    assert int(n) == 8
    assert np.all(filled)


def test_fill_open_notch_not_filled():
    binimg = np.ones((10, 10, 10), dtype=bool)
    binimg[0:5, 4:6, 4:6] = False  # notch open to the border
    filled, n = fill.fill(binimg, return_fill_count=True)
    assert int(n) == 0
    assert np.array_equal(np.asarray(filled), binimg)


def test_fill_matches_scipy():
    rng = np.random.default_rng(5)
    binimg = rng.random((16, 16, 16)) > 0.35
    want = scipy.ndimage.binary_fill_holes(binimg)
    got = np.asarray(fill.fill(binimg))
    assert np.array_equal(got, want)


def test_fill_2d():
    binimg = np.ones((8, 8), dtype=bool)
    binimg[3:5, 3:5] = False
    filled = np.asarray(fill.fill(binimg))
    assert filled.shape == (8, 8)
    assert np.all(filled)
