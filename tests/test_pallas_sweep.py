"""Equivalence of the Pallas sweep kernel vs the XLA scan sweep
(interpret mode on the CPU test backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kimimaro_tpu.ops import pallas_sweep
from kimimaro_tpu.ops.geodesic import _sweep, _relax_rounds_core


@pytest.fixture(autouse=True, scope="module")
def _interpret_mode():
    """Run Pallas kernels in interpret mode on the CPU test backend, and
    restore the flag afterwards (it changes which lowering OTHER modules'
    vmapped sweeps take)."""
    prev = pallas_sweep.INTERPRET
    pallas_sweep.INTERPRET = True
    _relax_rounds_core.cache_clear()
    yield
    pallas_sweep.INTERPRET = prev
    _relax_rounds_core.cache_clear()

ANIS = (1.0, 2.0, 1.5)


def _ref_sweep(d, ok, nc, node_mode, clamp):
    return _sweep(d, ok, nc if node_mode else None, 0, 1, ANIS, clamp)


@pytest.mark.parametrize("node_mode", (False, True))
@pytest.mark.parametrize("clamp", (False, True))
def test_sweep_axis0_matches(node_mode, clamp):
    rng = np.random.RandomState(7)
    shape = (6, 8, 8)
    d = rng.uniform(-3, 10, size=shape).astype(np.float32)
    d[rng.rand(*shape) < 0.3] = np.inf
    ok = rng.rand(*shape) < 0.8
    nc = rng.uniform(0, 2, size=shape).astype(np.float32)

    d0 = jnp.where(jnp.asarray(ok), jnp.asarray(d), jnp.inf)

    ref = np.asarray(
        _ref_sweep(d0, jnp.asarray(ok), jnp.asarray(nc), node_mode, clamp)
    )
    got = np.asarray(
        pallas_sweep.sweep_axis0(
            d0, jnp.asarray(ok), jnp.asarray(nc),
            ANIS, node_mode, clamp,
        )
    )
    finite = np.isfinite(ref)
    assert np.array_equal(finite, np.isfinite(got))
    assert np.allclose(ref[finite], got[finite], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("node_mode", (False, True))
@pytest.mark.parametrize("clamp", (False, True))
def test_sweep_axis0_batched_matches(node_mode, clamp):
    rng = np.random.RandomState(11)
    B, shape = 5, (6, 8, 8)
    d = rng.uniform(-3, 10, size=(B,) + shape).astype(np.float32)
    d[rng.rand(B, *shape) < 0.3] = np.inf
    ok = rng.rand(B, *shape) < 0.8
    nc = rng.uniform(0, 2, size=(B,) + shape).astype(np.float32)
    d0 = jnp.where(jnp.asarray(ok), jnp.asarray(d), jnp.inf)

    got = np.asarray(
        pallas_sweep.sweep_axis0_batched(
            d0, jnp.asarray(ok), jnp.asarray(nc), ANIS, node_mode, clamp
        )
    )
    for b in range(B):
        ref = np.asarray(
            _ref_sweep(d0[b], jnp.asarray(ok[b]), jnp.asarray(nc[b]),
                       node_mode, clamp)
        )
        finite = np.isfinite(ref)
        assert np.array_equal(finite, np.isfinite(got[b]))
        assert np.allclose(ref[finite], got[b][finite], rtol=1e-6, atol=1e-6)


def test_vmapped_sweep_uses_batched_rule():
    """vmap(_sweep) must agree with per-lane _sweep — this exercises the
    custom_vmap batching rule (Pallas in interpret mode on CPU)."""
    import jax

    rng = np.random.RandomState(3)
    B, shape = 4, (7, 6, 9)
    d = rng.uniform(0, 10, size=(B,) + shape).astype(np.float32)
    d[rng.rand(B, *shape) < 0.4] = np.inf
    ok = rng.rand(B, *shape) < 0.85
    d0 = jnp.where(jnp.asarray(ok), jnp.asarray(d), jnp.inf)
    ok_j = jnp.asarray(ok)

    for axis in (0, 1, 2):
        for direction in (1, -1):
            f = lambda dd, oo: _sweep(dd, oo, None, axis, direction, ANIS,
                                      False, pallas=False)
            got = np.asarray(jax.vmap(f)(d0, ok_j))
            for b in range(B):
                ref = np.asarray(f(d0[b], ok_j[b]))
                finite = np.isfinite(ref)
                assert np.array_equal(finite, np.isfinite(got[b])), (axis, direction, b)
                assert np.allclose(ref[finite], got[b][finite], rtol=1e-6)



def test_engine_batch_through_interpret_pallas():
    """End-to-end batched trace through the interpret-mode Pallas relax:
    equals the same batch through the vmapped-scan lowering."""
    import jax.numpy as jnp
    import numpy as np
    from kimimaro_tpu import engine
    from kimimaro_tpu.ops import edt as edt_ops
    from kimimaro_tpu.ops.geodesic import _axis0_sweep_core

    vol = np.zeros((40, 40, 16), dtype=np.int32)
    vol[2:18, 4:36, 2:14] = 1
    vol[22:38, 4:20, 2:14] = 2
    cc = jnp.asarray(vol)
    dbf = edt_ops.edt(cc, anisotropy=(1.0, 1.0, 1.0), black_border=False)
    jobs = [
        {"segid": 1, "offset": np.array([2, 4, 2]),
         "shape": np.array([16, 32, 12]), "before": [], "after": [],
         "root": None},
        {"segid": 2, "offset": np.array([22, 4, 2]),
         "shape": np.array([16, 16, 12]), "before": [], "after": [],
         "root": None},
    ]
    params = {"scale": 2, "const": 2, "pdrf_exponent": 4,
              "pdrf_scale": 100000}
    res, fb = engine.trace_batched(cc, dbf, jobs, params, (1.0, 1.0, 1.0),
                                   fix_branching=True, progress=False)
    assert not fb
    assert set(res) == {1, 2}
    for sid in (1, 2):
        assert sum(len(p[0]) for p in res[sid]) > 4


@pytest.mark.parametrize("node_mode", (False, True))
def test_batched_relax_voxel_graph_matches_scan(node_mode):
    """The vg-masked Pallas relax (interpret mode) must equal the scan-form
    per-lane relax with the same voxel_graph, across every axis/direction
    (walls block both straight and diagonal edges)."""
    import jax

    from kimimaro_tpu.ops.geodesic import relax_rounds_batchable
    from kimimaro_tpu.ops.stencils import GRAPH_BITS

    rng = np.random.RandomState(19)
    B, shape = 5, (7, 9, 8)
    ok = rng.rand(B, *shape) < 0.9
    d = np.full((B,) + shape, np.inf, dtype=np.float32)
    for b in range(B):
        s = tuple(rng.randint(0, n) for n in shape)
        d[(b,) + s] = 0.0
        ok[(b,) + s] = True
    nc = rng.uniform(0.1, 2, size=(B,) + shape).astype(np.float32)

    # random walls: drop each directed edge with p=0.3, symmetrically
    vg = np.full((B,) + shape, 0xFFFFFFFF, dtype=np.uint32)
    for off, bit in GRAPH_BITS.items():
        rev = GRAPH_BITS[tuple(-o for o in off)]
        drop = rng.rand(B, *shape) < 0.3
        vg &= ~np.where(drop, np.uint32(1 << bit), np.uint32(0))
        # the reverse bit of the neighbor: clear at shifted positions
        sl_src = [slice(None)]
        sl_dst = [slice(None)]
        for o, n in zip(off, shape):
            if o >= 0:
                sl_src.append(slice(o, n))
                sl_dst.append(slice(0, n - o))
            else:
                sl_src.append(slice(0, n + o))
                sl_dst.append(slice(-o, n))
        sub = np.zeros((B,) + shape, bool)
        sub[tuple(sl_src)] = drop[tuple(sl_dst)]
        vg &= ~np.where(sub, np.uint32(1 << rev), np.uint32(0))

    d0 = jnp.asarray(d)
    okj = jnp.asarray(ok)
    ncj = jnp.asarray(nc) if node_mode else None
    vgj = jnp.asarray(vg)

    f = lambda dd, oo, nn, vv: relax_rounds_batchable(
        dd, oo, nn if node_mode else None, (1.0, 2.0, 1.5), 3,
        voxel_graph=vv)
    # batched (interpret-mode Pallas through the custom_vmap rule)
    got, gconv = jax.vmap(
        lambda dd, oo, nn, vv: f(dd, oo, nn, vv)
    )(d0, okj, ncj if node_mode else jnp.zeros_like(d0), vgj)
    got = np.asarray(got)
    for b in range(B):
        ref, rconv = f(d0[b], okj[b],
                       ncj[b] if node_mode else None, vgj[b])
        ref = np.asarray(ref)
        finite = np.isfinite(ref)
        assert np.array_equal(finite, np.isfinite(got[b])), b
        assert np.allclose(ref[finite], got[b][finite], rtol=1e-5,
                           atol=1e-5), b
