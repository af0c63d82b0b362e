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


def _serial_fill_all_holes(cc_labels):
    """The reference's serial per-label loop (intake.py:747-794 semantics),
    kept as the oracle for the batched replay in intake.fill_all_holes."""
    import scipy.ndimage

    cc_labels = np.copy(cc_labels)
    labels = np.unique(cc_labels)
    labels_set = set(int(u) for u in labels if u != 0)
    all_slices = scipy.ndimage.find_objects(cc_labels)
    filled_px = 0
    for label in labels:
        label = int(label)
        if label not in labels_set:
            continue
        slices = all_slices[label - 1]
        if slices is None:
            continue
        binimg = cc_labels[slices] == label
        filled = scipy.ndimage.binary_fill_holes(binimg)
        n = int(filled.sum() - binimg.sum())
        filled_px += n
        if n == 0:
            continue
        sub = set(int(u) for u in np.unique(cc_labels[slices][filled]))
        sub.discard(label)
        labels_set -= sub
        cc_labels[slices] = np.where(filled, label, cc_labels[slices])
    return cc_labels, filled_px


def test_fill_label_crops_matches_per_label():
    rng = np.random.default_rng(11)
    vol = np.zeros((24, 20, 18), dtype=np.uint32)
    # blobs with carved interior holes, various bbox sizes
    vol[2:12, 2:12, 2:12] = 1
    vol[5:8, 5:8, 5:8] = 0
    vol[14:22, 3:17, 3:15] = 2
    vol[16:20, 6:14, 6:12] = 0
    vol[17:19, 8:12, 8:10] = 3  # label inside label 2's hole
    vol[1:4, 14:19, 12:17] = 4  # solid, nothing to fill
    import scipy.ndimage

    import jax.numpy as jnp

    from kimimaro_tpu.ops.fill import fill_label_crops

    slcs = scipy.ndimage.find_objects(vol)
    lids, offs, shapes = [], [], []
    for lid in (1, 2, 3, 4):
        s = slcs[lid - 1]
        lids.append(lid)
        offs.append([x.start for x in s])
        shapes.append([x.stop - x.start for x in s])
    out = fill_label_crops(
        jnp.asarray(vol), np.array(offs), np.array(shapes),
        np.array(lids), vol.shape)
    for (holes, n), lid in zip(out, lids):
        s = slcs[lid - 1]
        binimg = vol[s] == lid
        want = scipy.ndimage.binary_fill_holes(binimg)
        wholes = want & ~binimg
        assert int(wholes.sum()) == n
        if n == 0:
            assert holes is None
        else:
            assert np.array_equal(holes, wholes)


def test_fill_all_holes_matches_serial_oracle():
    from kimimaro_tpu import intake

    rng = np.random.RandomState(7)
    for trial in range(3):
        vol = np.zeros((28, 26, 24), dtype=np.uint32)
        # random boxes, later boxes may nest inside earlier ones
        for lid in range(1, 9):
            c = rng.randint(2, 20, size=3)
            e = rng.randint(3, 9, size=3)
            vol[c[0]:c[0] + e[0], c[1]:c[1] + e[1], c[2]:c[2] + e[2]] = lid
        want, want_n = _serial_fill_all_holes(vol)
        got, got_n = intake.fill_all_holes(vol, return_fill_count=True)
        assert got_n == want_n, trial
        assert np.array_equal(got, want), trial
