import numpy as np
import scipy.ndimage

from kimimaro_tpu.ops import ccl


def reference_ccl(labels):
    """Per-label 26-connected CCL using scipy as an oracle."""
    out = np.zeros(labels.shape, dtype=np.int64)
    structure = np.ones((3, 3, 3), dtype=bool)
    next_id = 1
    for lab in np.unique(labels):
        if lab == 0:
            continue
        comp, n = scipy.ndimage.label(labels == lab, structure=structure)
        out[comp > 0] = comp[comp > 0] + (next_id - 1)
        next_id += n
    return out


def same_partition(a, b):
    """Check two CC labelings induce the same partition of foreground."""
    fg = (a != 0) | (b != 0)
    assert np.array_equal(a != 0, b != 0)
    pairs_ab = {}
    pairs_ba = {}
    for x, y in zip(a[fg].ravel(), b[fg].ravel()):
        if x in pairs_ab and pairs_ab[x] != y:
            return False
        if y in pairs_ba and pairs_ba[y] != x:
            return False
        pairs_ab[x] = y
        pairs_ba[y] = x
    return True


def test_ccl_single_blob():
    labels = np.zeros((10, 10, 10), dtype=np.uint32)
    labels[2:8, 2:8, 2:8] = 7
    got = np.asarray(ccl.connected_components(labels))
    assert same_partition(got, reference_ccl(labels))


def test_ccl_multi_label_touching():
    labels = np.zeros((10, 10, 10), dtype=np.uint32)
    labels[:5] = 1
    labels[5:] = 2  # touching but different labels -> 2 components
    got = np.asarray(ccl.connected_components(labels))
    assert same_partition(got, reference_ccl(labels))
    assert len(np.unique(got)) == 2  # no background voxels: 2 components


def test_ccl_same_label_disjoint():
    labels = np.zeros((12, 12, 12), dtype=np.uint32)
    labels[0:3, 0:3, 0:3] = 5
    labels[8:11, 8:11, 8:11] = 5  # same label, disjoint -> 2 components
    got = np.asarray(ccl.connected_components(labels))
    assert same_partition(got, reference_ccl(labels))
    assert len(np.unique(got)) == 3


def test_ccl_diagonal_connectivity():
    labels = np.zeros((4, 4, 4), dtype=np.uint32)
    labels[0, 0, 0] = 1
    labels[1, 1, 1] = 1  # corner-adjacent: 26-connected -> one component
    got = np.asarray(ccl.connected_components(labels))
    fg = got[labels > 0]
    assert fg[0] == fg[1]


def test_ccl_random_fuzz():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 3, size=(14, 12, 10)).astype(np.uint32)
    got = np.asarray(ccl.connected_components(labels))
    assert same_partition(got, reference_ccl(labels))


def test_renumber_cc():
    labels = np.zeros((8, 8, 8), dtype=np.uint32)
    labels[0:2] = 11
    labels[4:6] = 22
    raw = np.asarray(ccl.connected_components(labels))
    cc, remapping = ccl.renumber_cc(raw, labels)
    assert set(np.unique(cc)) == {0, 1, 2}
    assert set(remapping.values()) == {11, 22}
    for cid, orig in remapping.items():
        assert np.all(labels[cc == cid] == orig)


def test_label_info_fuzz():
    """label_info (one KV-sort + block pyramids) vs a numpy oracle:
    counts, inclusive bboxes, and original-label mapping, across shapes
    that exercise the ragged block edges (n % 256 != 0)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    for shape in [(7, 9, 11), (16, 16, 16), (33, 5, 21), (64, 64, 3)]:
        labels = rng.randint(0, 5, size=shape).astype(np.uint32) * 7
        cc_raw = ccl.connected_components(jnp.asarray(labels))
        cc_dev, n_comp, prefix = ccl.compact_cc(cc_raw)
        if n_comp == 0:
            continue
        n_max = 1 << max(int(np.ceil(np.log2(max(n_comp, 2)))), 1)
        dbf = rng.rand(*shape).astype(np.float32)
        counts, bbmin, bbmax, orig, dbfmax = ccl.label_info(
            cc_dev, jnp.asarray(labels), n_max=n_max, rep_prefix=prefix,
            dbf=jnp.asarray(dbf),
        )
        dbfmax = np.asarray(dbfmax)
        counts = np.asarray(counts)
        bbmin = np.asarray(bbmin)
        bbmax = np.asarray(bbmax)
        orig = np.asarray(orig)
        cc = np.asarray(cc_dev)
        for i in range(1, n_comp + 1):
            mask = cc == i
            assert counts[i] == mask.sum()
            xs, ys, zs = np.nonzero(mask)
            assert np.array_equal(bbmin[i], [xs.min(), ys.min(), zs.min()])
            assert np.array_equal(bbmax[i], [xs.max(), ys.max(), zs.max()])
            vals = np.unique(labels[mask])
            assert len(vals) == 1 and vals[0] == orig[i]
            assert np.isclose(dbfmax[i], dbf[mask].max())
        # absent ids past n_comp: sentinel bboxes, zero counts
        if n_max > n_comp:
            assert counts[n_comp + 1] == 0
            assert np.all(bbmax[n_comp + 1] == -1)
