"""End-to-end multi-chip skeletonize on the virtual 8-device CPU mesh must
equal the single-chip result (VERDICT round-1 item #5; reference scaling
story: intake.py:58-266 + README.md:389-409)."""

import jax
import numpy as np
import pytest

import kimimaro_tpu
from kimimaro_tpu.parallel import make_mesh, skeletonize_sharded

N_DEV = min(8, len(jax.devices()))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(N_DEV)


@pytest.fixture(scope="module")
def mesh_small():
    # variants run on a 4-device mesh: same sharding logic, half the
    # virtual-device serialization on the 1-CPU test box (the full
    # 8-device path is pinned by test_sharded_equals_single_chip and the
    # driver's dryrun_multichip)
    return make_mesh(min(4, N_DEV))


def _vertex_set(skel):
    return set(map(tuple, np.round(skel.vertices, 3).tolist()))


def two_label_volume():
    labels = np.zeros((16, 24, 8), dtype=np.uint32)
    labels[2:14, 4:8, 2:6] = 7      # a bar crossing every shard
    labels[4:12, 14:20, 2:6] = 9    # a second component
    return labels


def test_sharded_equals_single_chip(mesh):
    labels = two_label_volume()
    single = kimimaro_tpu.skeletonize(
        labels, anisotropy=(1, 1, 1), dust_threshold=10
    )
    sharded = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10
    )
    assert sorted(single) == sorted(sharded) == [7, 9]
    for k in single:
        assert _vertex_set(single[k]) == _vertex_set(sharded[k])
        assert abs(single[k].cable_length() - sharded[k].cable_length()) < 1e-3


def test_sharded_padded_axis(mesh_small):
    mesh = mesh_small
    # leading axis not divisible by the mesh: zero-padding path
    labels = np.zeros((10, 12, 8), dtype=np.uint32)
    labels[1:9, 4:8, 2:6] = 3
    single = kimimaro_tpu.skeletonize(
        labels, anisotropy=(1, 1, 1), dust_threshold=10
    )
    sharded = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10
    )
    assert sorted(single) == sorted(sharded) == [3]
    assert _vertex_set(single[3]) == _vertex_set(sharded[3])


def test_sharded_single_label_black_border(mesh_small):
    mesh = mesh_small
    # single-label volume exercises the black_border + pad equivalence
    labels = np.ones((8, 12, 8), dtype=np.uint32)
    single = kimimaro_tpu.skeletonize(
        labels, anisotropy=(1, 1, 1), dust_threshold=10
    )
    sharded = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10
    )
    assert _vertex_set(single[1]) == _vertex_set(sharded[1])


def test_sharded_fix_borders(mesh_small):
    mesh = mesh_small
    labels = np.zeros((8, 12, 8), dtype=np.uint32)
    labels[:, 3:5, 3:5] = 2  # tube hitting both sharded-axis faces
    single = kimimaro_tpu.skeletonize(
        labels, anisotropy=(1, 1, 1), dust_threshold=10, fix_borders=True
    )
    sharded = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10,
        fix_borders=True,
    )
    assert _vertex_set(single[2]) == _vertex_set(sharded[2])


def test_sharded_never_gathers_full_volume(mesh_small, monkeypatch):
    mesh = mesh_small
    """VERDICT r2 item 3: the trace stage must fetch per-label bbox crops
    only — a volume needing the whole mesh's HBM would OOM one host at a
    full-volume gather. Intercept every device->host conversion and bound
    the largest single fetch."""
    labels = np.zeros((32, 24, 16), dtype=np.uint32)
    labels[4:18, 4:8, 4:8] = 5
    labels[20:30, 12:16, 8:12] = 6
    vol_elems = labels.size
    seen = []

    import jax._src.array as _jarray

    real_get = jax.device_get
    real_arr = _jarray.ArrayImpl.__array__

    def spy_get(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "size"):
                seen.append(int(np.prod(leaf.shape)))
        return real_get(tree)

    def spy_arr(self, *a, **k):
        seen.append(int(np.prod(self.shape)))
        return real_arr(self, *a, **k)

    monkeypatch.setattr(jax, "device_get", spy_get)
    monkeypatch.setattr(_jarray.ArrayImpl, "__array__", spy_arr)

    sharded = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10
    )

    monkeypatch.undo()
    assert sorted(sharded) == [5, 6]
    assert seen, "no transfers recorded — spy not effective"
    assert max(seen) < vol_elems // 2, (
        f"full-volume-scale gather detected: max fetch {max(seen)} elems "
        f"of a {vol_elems}-elem volume"
    )


def test_gather_crops_sharded_matches_naive(mesh_small):
    """VERDICT r3 item 7: the trace stage's crop gather is one batched
    device-side dispatch; crops spanning shard boundaries must assemble
    exactly (psum of per-shard intersections)."""
    import jax.numpy as jnp

    from kimimaro_tpu.parallel.sharded import shard_volume
    from kimimaro_tpu.parallel.skeletonize import _gather_crops_sharded

    mesh = mesh_small
    n_dev = int(mesh.devices.size)
    rng = np.random.RandomState(3)
    vol = rng.randint(0, 50, size=(8 * n_dev, 24, 16)).astype(np.int32)
    dbf = rng.rand(*vol.shape).astype(np.float32)

    cc_dev = shard_volume(jnp.asarray(vol), mesh)
    dbf_dev = shard_volume(jnp.asarray(dbf), mesh)

    bshape = (8, 8, 8)
    # crop starts chosen to cross shard boundaries (shard height = 8)
    offs = np.array([
        [0, 0, 0],
        [4, 3, 2],        # spans shards 0-1
        [8 * n_dev - 8, 16, 8],
        [7, 5, 1],        # spans shards 0-1 at the seam
    ], dtype=np.int32)

    ccs, dbs = _gather_crops_sharded(
        cc_dev, dbf_dev, jnp.asarray(offs), mesh, bshape)
    ccs = np.asarray(ccs)
    dbs = np.asarray(dbs)
    for j, o in enumerate(offs):
        sl = tuple(slice(int(a), int(a + b)) for a, b in zip(o, bshape))
        np.testing.assert_array_equal(ccs[j], vol[sl])
        np.testing.assert_allclose(dbs[j], dbf[sl])


def test_sharded_crop_gather_is_batched(mesh_small, monkeypatch):
    """The per-chunk gather of the CROP fallback path must be O(1) device
    dispatches, not a per-label host device_get loop: count host fetches
    of crop-sized arrays during the trace stage. (The sharded gengine now
    handles eligible labels without any crop gather at all — disable it
    so this test exercises the fallback path the soma/oversized labels
    take.)"""
    mesh = mesh_small
    monkeypatch.setenv("KIMIMARO_TPU_SHARDED_GENGINE", "0")
    labels = np.zeros((32, 24, 16), dtype=np.uint32)
    for i, (x, y) in enumerate([(2, 2), (2, 12), (12, 2), (12, 12),
                                (22, 2), (22, 12)]):
        labels[x:x + 8, y:y + 4, 4:10] = i + 1

    from kimimaro_tpu.parallel import skeletonize as sk_mod

    calls = []
    real = sk_mod._gather_crops_sharded

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sk_mod, "_gather_crops_sharded", spy)
    out = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10)
    assert sorted(out) == [1, 2, 3, 4, 5, 6]
    # 6 same-bucket labels ride few chunks; a per-label loop would be >= 6
    assert 1 <= len(calls) < 6, calls


def test_sharded_gengine_traces_without_crop_gather(mesh_small, monkeypatch):
    """With the sharded gengine ON (the default), eligible labels trace
    with ZERO crop gathers — the volume never leaves the mesh."""
    mesh = mesh_small
    labels = np.zeros((32, 24, 16), dtype=np.uint32)
    for i, (x, y) in enumerate([(2, 2), (2, 12), (12, 2), (12, 12),
                                (22, 2), (22, 12)]):
        labels[x:x + 8, y:y + 4, 4:10] = i + 1

    from kimimaro_tpu.parallel import skeletonize as sk_mod

    calls = []
    real = sk_mod._gather_crops_sharded

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sk_mod, "_gather_crops_sharded", spy)
    out = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10)
    assert sorted(out) == [1, 2, 3, 4, 5, 6]
    assert len(calls) == 0, calls


def test_sharded_voxel_graph_equals_single_chip(mesh_small):
    """voxel_graph (self-touch walls) on the sharded path: CCL splitting,
    EDT walls (incl. along the SHARDED axis via the ring pass's global
    wall segments), and the trace must all match the single-chip driver
    (VERDICT r4 item 7)."""
    from kimimaro_tpu.ops.stencils import GRAPH_BITS

    mesh = mesh_small
    ALL = np.uint32((1 << 26) - 1)
    labels = np.zeros((16, 12, 8), dtype=np.uint32)
    labels[2:14, 4:8, 2:6] = 7  # one bar crossing every shard

    # wall between x=7 and x=8 (a shard boundary region): the single
    # label must split into two components on both paths
    vg = np.full(labels.shape, ALL, dtype=np.uint32)
    lo = hi = np.uint32(ALL)
    for o, b in GRAPH_BITS.items():
        if o[0] == 1:
            lo &= np.uint32(~(1 << b) & 0x3FFFFFF)
        if o[0] == -1:
            hi &= np.uint32(~(1 << b) & 0x3FFFFFF)
    vg[7] = lo
    vg[8] = hi

    single = kimimaro_tpu.skeletonize(
        labels, anisotropy=(1, 1, 1), dust_threshold=10, voxel_graph=vg
    )
    sharded = skeletonize_sharded(
        labels, mesh=mesh, anisotropy=(1, 1, 1), dust_threshold=10,
        voxel_graph=vg,
    )
    assert sorted(single) == sorted(sharded)
    assert len(single) >= 1
    for k in single:
        assert _vertex_set(single[k]) == _vertex_set(sharded[k])


def test_sharded_edt_ccl_voxel_graph_equal_single_chip(mesh_small):
    """Field-level equality: sharded CCL/EDT with a voxel_graph equal the
    single-chip kernels bit-for-bit, wall along the sharded axis."""
    import jax.numpy as jnp

    from kimimaro_tpu.ops import edt as edt_ops
    from kimimaro_tpu.ops.ccl import connected_components
    from kimimaro_tpu.ops.stencils import GRAPH_BITS
    from kimimaro_tpu.parallel import shard_volume
    from kimimaro_tpu.parallel.sharded import (
        sharded_ccl_rounds, sharded_edtsq)

    mesh = mesh_small
    ALL = np.uint32((1 << 26) - 1)
    rng = np.random.RandomState(3)
    labels = (rng.rand(8, 6, 5) > 0.3).astype(np.uint8)
    vg = np.full(labels.shape, ALL, dtype=np.uint32)
    lo = hi = np.uint32(ALL)
    for o, b in GRAPH_BITS.items():
        if o[0] == 1:
            lo &= np.uint32(~(1 << b) & 0x3FFFFFF)
        if o[0] == -1:
            hi &= np.uint32(~(1 << b) & 0x3FFFFFF)
    vg[3] = lo
    vg[4] = hi

    lab_dev = shard_volume(jnp.asarray(labels), mesh)
    vg_dev = shard_volume(jnp.asarray(vg), mesh)

    dsq_sh = np.asarray(sharded_edtsq(
        lab_dev, mesh, (2.0, 1.0, 1.0), black_border=True,
        voxel_graph=vg_dev))
    dsq_single = np.asarray(edt_ops.edtsq(
        labels, (2.0, 1.0, 1.0), black_border=True, voxel_graph=vg))
    np.testing.assert_allclose(dsq_sh, dsq_single, rtol=0, atol=0)

    ids_sh = np.asarray(sharded_ccl_rounds(lab_dev, mesh, voxel_graph=vg_dev))
    ids_single = np.asarray(connected_components(labels, voxel_graph=vg))
    # component PARTITIONS must agree (id values are scheme-specific)
    from collections import defaultdict

    def parts(ids):
        groups = defaultdict(set)
        for idx, v in np.ndenumerate(ids):
            if labels[idx]:
                groups[int(v)].add(idx)
        return sorted(frozenset(g) for g in groups.values())

    assert parts(ids_sh) == parts(ids_single)
