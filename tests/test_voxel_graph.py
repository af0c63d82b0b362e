"""voxel_graph (self-touch wall) tests.

Bit conventions from the reference dijkstra_invalidation.hpp:150-191 /
cc3d_graphs.hpp: bit k at voxel v permits movement from v along offset k.
"""

import numpy as np
import pytest

import kimimaro_tpu
from kimimaro_tpu.ops.ccl import connected_components
from kimimaro_tpu.ops import edt as edt_ops
from kimimaro_tpu.ops.stencils import GRAPH_BITS

ALL = np.uint32((1 << 26) - 1)

POS_X_BITS = [b for o, b in GRAPH_BITS.items() if o[0] == 1]
NEG_X_BITS = [b for o, b in GRAPH_BITS.items() if o[0] == -1]


def wall_graph(shape, x_wall: int) -> np.ndarray:
    """All movement allowed except crossing the plane between x_wall-1 and
    x_wall."""
    vg = np.full(shape, ALL, dtype=np.uint32)
    lo = np.uint32(ALL)
    for b in POS_X_BITS:
        lo &= np.uint32(~(1 << b) & 0x3FFFFFF)
    hi = np.uint32(ALL)
    for b in NEG_X_BITS:
        hi &= np.uint32(~(1 << b) & 0x3FFFFFF)
    vg[x_wall - 1] = lo
    vg[x_wall] = hi
    return vg


def test_ccl_respects_wall():
    labels = np.ones((8, 4, 4), dtype=np.uint8)
    vg = wall_graph(labels.shape, 4)

    cc_plain = np.asarray(connected_components(labels))
    assert len(np.unique(cc_plain)) == 1 + 0  # one component, no bg

    cc_walled = np.asarray(connected_components(labels, voxel_graph=vg))
    assert len(np.unique(cc_walled)) == 2
    assert cc_walled[0, 0, 0] != cc_walled[7, 0, 0]


def test_edt_wall_is_boundary():
    labels = np.ones((8, 9, 9), dtype=np.uint8)
    vg = wall_graph(labels.shape, 4)
    d = np.asarray(edt_ops.edt(labels, (1, 1, 1), black_border=True,
                               voxel_graph=vg))
    # voxels adjacent to the wall behave like voxels adjacent to a border
    assert d[3, 4, 4] == 1.0
    assert d[4, 4, 4] == 1.0
    # interior of each half: distance limited by the wall, not the far side
    assert d[2, 4, 4] == 2.0


def test_skeletonize_with_voxel_graph():
    # one label whose two halves touch but are walled apart -> the merged
    # skeleton has two connected components
    labels = np.zeros((12, 5, 5), dtype=np.uint8)
    labels[:, 1:4, 1:4] = 1
    vg = wall_graph(labels.shape, 6)

    params = {"scale": 1.5, "const": 30, "pdrf_exponent": 4,
              "pdrf_scale": 100000}

    plain = kimimaro_tpu.skeletonize(
        labels, teasar_params=params, dust_threshold=0, fix_borders=False,
    )
    assert len(plain[1].components()) == 1

    walled = kimimaro_tpu.skeletonize(
        labels, teasar_params=params, dust_threshold=0, fix_borders=False,
        voxel_graph=vg,
    )
    assert len(walled[1].components()) == 2


def test_voxel_graph_through_batched_engine():
    """Self-touch volumes must ride the batched engine (no host fallback)
    and match the host trace loop (VERDICT round-1 item #7)."""
    from kimimaro_tpu import engine, trace as trace_mod
    from kimimaro_tpu.ops import edt as edt_ops
    import jax.numpy as jnp

    labels = np.zeros((12, 5, 5), dtype=np.uint8)
    labels[:, 1:4, 1:4] = 1
    vg = wall_graph(labels.shape, 6)

    cc = connected_components(jnp.asarray(labels), voxel_graph=jnp.asarray(vg))
    from kimimaro_tpu.ops.ccl import compact_cc
    cc, n_comp, _ = compact_cc(cc)
    assert int(n_comp) == 2

    dbf = edt_ops.edt(jnp.asarray(labels), (1, 1, 1), voxel_graph=jnp.asarray(vg))
    params = {"scale": 1.5, "const": 30, "pdrf_exponent": 4,
              "pdrf_scale": 100000}

    jobs = []
    cc_np = np.asarray(cc)
    for segid in (1, 2):
        pos = np.argwhere(cc_np == segid)
        mn, mx = pos.min(0), pos.max(0)
        jobs.append({"segid": segid, "offset": mn, "shape": mx - mn + 1,
                     "before": [], "after": [], "root": None})

    results, fallback = engine.trace_batched(
        cc, dbf, jobs, params, (1, 1, 1), True,
        voxel_graph=jnp.asarray(vg),
    )
    assert fallback == []          # nothing fell back to the host loop
    assert sorted(results) == [1, 2]

    # engine output == host trace loop on the same walled crops
    for job in jobs:
        segid = job["segid"]
        mn = job["offset"]
        slc = tuple(slice(int(a), int(a + s)) for a, s in zip(mn, job["shape"]))
        fg_crop = cc_np[slc] == segid
        dbf_crop = np.where(fg_crop, np.asarray(dbf)[slc], 0.0).astype(np.float32)
        host = trace_mod.trace(
            fg_crop, dbf_crop, anisotropy=(1, 1, 1), fix_branching=True,
            voxel_graph=jnp.asarray(vg[slc]), **params,
        )
        dev_verts = set()
        for verts, _ in results[segid]:
            dev_verts.update(map(tuple, verts.tolist()))
        host_verts = set(map(tuple, host.vertices.astype(int).tolist()))
        assert dev_verts == host_verts
