"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest.py forces xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimimaro_tpu.ops import edt as edt_ops
from kimimaro_tpu.ops.geodesic import distance_field
from kimimaro_tpu.parallel import (
    make_mesh,
    preamble_step,
    shard_volume,
    sharded_ccl_rounds,
    sharded_distance_rounds,
    sharded_edtsq,
)

N_DEV = min(8, len(jax.devices()))


@pytest.fixture(scope="module")
def mesh():
    # kernel-level equivalence runs on a 4-device mesh: same shard_map /
    # ppermute code paths, half the virtual-device serialization on the
    # 1-CPU test box. The full 8-device mesh stays covered by
    # test_preamble_step_runs, the sharded e2e suite, and the driver's
    # dryrun_multichip.
    return make_mesh(min(4, N_DEV))


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(N_DEV)


def random_labels(shape, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 3, size=shape)).astype(np.int32)


def test_sharded_edt_matches_single(mesh):
    labels = random_labels((16, 8, 8))
    ref = np.asarray(edt_ops.edtsq(labels, (2.0, 1.0, 1.5)))
    got = np.asarray(
        sharded_edtsq(shard_volume(labels, mesh), mesh, (2.0, 1.0, 1.5))
    )
    assert np.allclose(ref, got, rtol=1e-5, atol=1e-4)


def test_sharded_edt_black_border(mesh):
    labels = np.ones((16, 8, 8), dtype=np.int32)
    ref = np.asarray(edt_ops.edtsq(labels, (1.0, 1.0, 1.0), black_border=True))
    got = np.asarray(
        sharded_edtsq(shard_volume(labels, mesh), mesh, (1.0, 1.0, 1.0), True)
    )
    assert np.allclose(ref, got, rtol=1e-5, atol=1e-4)


def test_sharded_distance_matches_single(mesh):
    # a straight tube crossing all shards
    labels = np.zeros((16, 8, 8), dtype=np.int32)
    labels[:, 3:5, 3:5] = 1
    ok = labels != 0
    init = np.full(labels.shape, np.inf, dtype=np.float32)
    init[0, 3, 3] = 0.0

    ref = np.asarray(distance_field(ok, init, (1.0, 1.0, 1.0)))
    got = np.asarray(
        sharded_distance_rounds(
            shard_volume(jnp.asarray(init), mesh),
            shard_volume(jnp.asarray(ok), mesh),
            mesh,
            (1.0, 1.0, 1.0),
            rounds=N_DEV + 2,  # halos cross one shard boundary per round
        )
    )
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(got))
    assert np.allclose(ref[finite], got[finite], rtol=1e-5, atol=1e-4)


def test_sharded_ccl_components(mesh):
    # two tubes, one crossing every shard boundary, one confined
    labels = np.zeros((16, 8, 8), dtype=np.int32)
    labels[:, 1:3, 1:3] = 5
    labels[2:4, 5:7, 5:7] = 5
    ids = np.asarray(sharded_ccl_rounds(shard_volume(labels, mesh), mesh, 16))

    tube = ids[:, 1, 1]
    assert np.all(tube == tube[0])  # one id across all shards
    blob = ids[2:4, 5:7, 5:7]
    assert np.all(blob == blob.flat[0])
    assert blob.flat[0] != tube[0]
    assert np.all(ids[labels == 0] == 0)


def test_preamble_step_runs(mesh8):
    mesh = mesh8
    labels = random_labels((16, 8, 8), seed=1)
    out = preamble_step(shard_volume(labels, mesh), mesh, (1.0, 1.0, 1.0))
    assert out["dbf"].shape == labels.shape
    assert out["pdrf"].shape == labels.shape
    assert bool(jnp.all(out["dbf"][labels == 0] == 0))
