"""skeletonize() pipeline tests — ported from the reference
automated_test.py behavioral oracles at sizes suited to the CPU backend."""

import numpy as np
import pytest

import kimimaro_tpu
from kimimaro_tpu import intake
from kimimaro_tpu.skeleton import Skeleton

TEASAR_SIMPLE = {
    "const": 250,
    "scale": 10,
    "pdrf_exponent": 4,
    "pdrf_scale": 100000,
}


def test_empty_image():
    labels = np.zeros((64, 64, 64), dtype=bool)
    skels = kimimaro_tpu.skeletonize(labels, fix_borders=True)
    assert len(skels) == 0


def test_very_sparse_image():
    labels = np.zeros((32, 32, 32), dtype=bool)
    labels[5, 5, 5] = True
    labels[6, 5, 5] = True
    labels[20, 20, 20] = True
    skels = kimimaro_tpu.skeletonize(labels, dust_threshold=0, fix_borders=False)
    # single voxels don't get skeletonized (reference automated_test.py:23-30)
    assert len(skels) == 1


def test_solid_image():
    labels = np.ones((48, 48, 48), dtype=bool)
    skels = kimimaro_tpu.skeletonize(labels, fix_borders=True)
    assert len(skels) == 1


def test_square_via_skeletonize():
    # reference automated_test.py:49-88 at 100x100
    n = 100
    labels = np.ones((n, n), dtype=np.uint8)
    labels[-1, 0] = 0
    labels[0, -1] = 0

    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=dict(kimimaro_tpu.DEFAULT_TEASAR_PARAMS),
        fix_borders=False, dust_threshold=100,
    )
    assert len(skels) == 1
    skel = skels[1]
    assert skel.vertices.shape[0] == n
    assert skel.edges.shape[0] == n - 1
    assert abs(skel.cable_length() - (n - 1) * np.sqrt(2)) < 1e-3
    assert skel.space == "physical"


def test_binary_image():
    # boolean input volume (reference automated_test.py:39-46)
    labels = np.ones((64, 64, 3), dtype=bool)
    labels[-1, 0] = 0
    labels[0, -1] = 0
    skels = kimimaro_tpu.skeletonize(labels, fix_borders=False,
                                     dust_threshold=100)
    assert len(skels) == 1


def test_fix_borders_y():
    labels = np.zeros((32, 32, 32), dtype=np.uint8)
    labels[8:25, :, 8:25] = 128
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR_SIMPLE, anisotropy=(1, 1, 1),
        dust_threshold=1000, fix_borders=True,
    )
    skel = skels[128].voxel_space()
    assert np.all(skel.vertices[:, 0] == 16)
    assert np.all(np.sort(skel.vertices[:, 1]) == np.arange(32))
    assert np.all(skel.vertices[:, 2] == 16)


def test_dimensions():
    for shape in [(10,), (10, 10), (10, 10, 10), (10, 10, 10, 1)]:
        kimimaro_tpu.skeletonize(np.zeros(shape, dtype=np.uint8))
    with pytest.raises(kimimaro_tpu.DimensionError):
        kimimaro_tpu.skeletonize(np.zeros((10, 10, 10, 2), dtype=np.uint8))


def test_find_border_targets():
    # reference automated_test.py:104-114 (at 65x65): centered square plane
    # must pick the exact center pixel
    from kimimaro_tpu.ops import edt as edt_ops

    labels = np.zeros((65, 65), dtype=np.uint8)
    labels[1:-1, 1:-1] = 1

    dt = np.asarray(edt_ops.edt(labels.astype(np.int32), (1.0, 1.0)))
    targets = intake.find_border_targets(dt, labels.astype(np.uint32), wx=100, wy=100)
    assert len(targets) == 1
    assert targets[1] == (32, 32)


def test_fix_borders_z():
    # reference automated_test.py:116-146 at 64^3: axis-aligned slab produces
    # a perfectly straight centerline at the deterministic border target
    labels = np.zeros((32, 32, 32), dtype=np.uint8)
    labels[8:25, 8:25, :] = 128

    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR_SIMPLE, anisotropy=(40, 32, 20),
        dust_threshold=1000, fix_branching=True, fix_borders=True,
    )
    skel = skels[128]
    assert skel.space == "physical"
    skel = skel.voxel_space()
    assert np.all(skel.vertices[:, 0] == 16)
    assert np.all(skel.vertices[:, 1] == 16)
    assert np.all(np.sort(skel.vertices[:, 2]) == np.arange(32))
    assert skel.space == "voxel"


def test_fix_borders_x():
    labels = np.zeros((32, 32, 32), dtype=np.uint8)
    labels[:, 8:25, 8:25] = 128
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR_SIMPLE, anisotropy=(1, 1, 1),
        dust_threshold=1000, fix_borders=True,
    )
    skel = skels[128].voxel_space()
    assert np.all(np.sort(skel.vertices[:, 0]) == np.arange(32))
    assert np.all(skel.vertices[:, 1] == 16)
    assert np.all(skel.vertices[:, 2] == 16)


def test_extra_targets():
    labels = np.zeros((64, 64, 1), dtype=np.uint8)
    labels[16:49, 16:49, :] = 128

    def skeletonize(labels, **kwargs):
        return kimimaro_tpu.skeletonize(
            labels, teasar_params=TEASAR_SIMPLE, anisotropy=(1, 1, 1),
            dust_threshold=100, fix_borders=True, **kwargs
        )[128]

    # an extra target off the auto-traced diagonal
    skel1 = skeletonize(labels)
    skel2 = skeletonize(labels, extra_targets_after=[(17, 45, 0)])
    assert skel1.vertices.size < skel2.vertices.size

    skel3 = skeletonize(labels, extra_targets_before=[(17, 45, 0)])
    assert skel3.vertices.size < skel2.vertices.size


def test_parallel_labels():
    # reference automated_test.py:234-259: 4 quadrant labels all skeletonized
    labels = np.zeros((64, 64, 32), dtype=np.uint8)
    labels[0:32, 0:32, :] = 1
    labels[0:32, 32:64, :] = 2
    labels[32:64, 0:32, :] = 3
    labels[32:64, 32:64, :] = 4

    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR_SIMPLE, dust_threshold=1000,
        fix_borders=True, parallel=2,
    )
    assert len(skels) == 4


@pytest.mark.parametrize("axis", ("x", "y"))
def test_joinability(axis):
    # reference automated_test.py:281-333 at 96x96x20
    def skeletonize(labels, fix_borders):
        return kimimaro_tpu.skeletonize(
            labels,
            teasar_params={
                "const": 10, "scale": 10,
                "pdrf_exponent": 4, "pdrf_scale": 100000,
            },
            anisotropy=(1, 1, 1), dust_threshold=0,
            fix_branching=True, fix_borders=fix_borders, parallel=1,
        )

    labels = np.zeros((48, 48, 20), dtype=np.uint8)
    if axis == "x":
        labels[6:30, :, :] = 1
    else:
        labels[:, 6:30, :] = 1

    s1 = skeletonize(labels[:, :, :10], True)[1]
    s2 = skeletonize(labels[:, :, 9:], True)[1]
    s2.vertices[:, 2] += 9
    skels_fb = s1.merge(s2)
    assert len(skels_fb.components()) == 1

    s1 = skeletonize(labels[:, :, :10], False)[1]
    s2 = skeletonize(labels[:, :, 9:], False)[1]
    s2.vertices[:, 2] += 9
    skels = s1.merge(s2)
    assert not Skeleton.equivalent(skels, skels_fb)


def test_fill_all_holes():
    # reference automated_test.py:458-476
    labels = np.zeros((64, 32, 32), dtype=np.uint32)
    labels[0:32, :, :] = 1
    labels[32:64, :, :] = 8

    rng = np.random.RandomState(42)
    labels[1:31, 1:31, 1:31] = rng.randint(low=1, high=8, size=(30, 30, 30))
    labels[33:63, 1:31, 1:31] = rng.randint(low=8, high=11, size=(30, 30, 30))

    assert set(np.unique(labels)) == set(range(1, 11))
    result = intake.fill_all_holes(labels)
    assert set(np.unique(result)) == {1, 8}


def test_fix_avocados():
    # reference automated_test.py:478-509 at quarter scale
    import jax
    from kimimaro_tpu.ops import edt as edt_ops

    labels = np.zeros((32, 32, 32), dtype=np.uint32)
    # fake clipped avocado
    labels[:13, :10, :8] = 1
    labels[:6, :5, :6] = 2
    # double avocado
    labels[13:25, 10:25, 8:20] = 3
    labels[15:23, 13:23, 10:18] = 4
    labels[15:18, 13:22, 11:17] = 5
    # not an avocado
    labels[28:, 28:, 28:] = 6  # not a pit
    labels[25:28, 28:, 28:] = 7  # not a fruit

    def fn(lbls):
        return np.asarray(jax.device_get(edt_ops.edt(lbls, (1, 1, 1))))

    dt = fn(labels)
    out_labels, dbf, remapping = intake.engage_avocado_protection(
        labels, dt, {i: i for i in range(1, 8)},
        soma_detection_threshold=1, edtfn=fn, progress=False,
    )

    uniq = set(int(u) for u in np.unique(out_labels))
    assert uniq == {0, 1, 2, 3, 4}  # 2 and 5 absorbed, renumbered
    assert np.all(out_labels[:13, :10, :8] == 1)
    assert np.all(out_labels[13:25, 10:25, 8:20] == 2)
    assert np.all(out_labels[25:28, 28:, 28:] == 3)
    assert np.all(out_labels[28:, 28:, 28:] == 4)


def test_synapses_to_targets():
    labels = np.zeros((20, 20, 20), dtype=np.uint8)
    labels[5:15, 5:15, 5:15] = 3
    synapses = {3: [((0.0, 0.0, 0.0), 7), ((10.0, 10.0, 10.0), 8)]}
    targets = intake.synapses_to_targets(labels, synapses)
    assert targets[(5, 5, 5)] == 7
    assert targets[(10, 10, 10)] == 8


def test_connect_points():
    labels = np.zeros((30, 5, 5), dtype=bool)
    labels[:, 1:4, 1:4] = True
    skel = kimimaro_tpu.connect_points(labels, (0, 2, 2), (29, 2, 2))
    assert skel.vertices.shape[0] == 30
    assert skel.space == "physical"

    labels2 = np.zeros((30, 5, 5), dtype=bool)
    labels2[:10, 1:4, 1:4] = True
    labels2[20:, 1:4, 1:4] = True
    with pytest.raises(ValueError):
        kimimaro_tpu.connect_points(labels2, (0, 2, 2), (29, 2, 2))


def test_object_ids_masking():
    labels = np.zeros((48, 48, 8), dtype=np.uint8)
    labels[0:20, :, :] = 1
    labels[28:48, :, :] = 2
    skels = kimimaro_tpu.skeletonize(
        labels, teasar_params=TEASAR_SIMPLE, object_ids=[2],
        dust_threshold=100, fix_borders=False,
    )
    assert set(skels.keys()) == {2}
