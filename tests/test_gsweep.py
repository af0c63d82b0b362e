"""Equivalence of the global full-volume masked sweeps (ops.gsweep) with
the crop engine's per-label relaxations (ops.fused_trace._relax_rounds).

Connected components partition the foreground, so a cc-masked full-volume
relaxation restricted to one label's bbox must be bit-identical to relaxing
that label alone in its crop (background/other labels == +inf == crop
boundary)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kimimaro_tpu.ops import gsweep
from kimimaro_tpu.ops.fused_trace import _relax_rounds

INF = np.float32(np.inf)


def _three_blob_volume():
    """Three 26-connected labels with irregular shapes in a 20x18x14 box."""
    rng = np.random.RandomState(7)
    vol = np.zeros((20, 18, 14), dtype=np.int32)
    vol[2:9, 2:9, 2:7] = 1
    vol[11:19, 3:12, 3:12] = 2
    vol[3:8, 11:17, 6:13] = 3
    # roughen the shapes (keep connectivity by only carving boundaries)
    for lab, sl in ((1, np.s_[2:9, 2:9, 2:7]), (2, np.s_[11:19, 3:12, 3:12]),
                    (3, np.s_[3:8, 11:17, 6:13])):
        m = vol[sl]
        carve = rng.rand(*m.shape) < 0.2
        carve[1:-1, 1:-1, 1:-1] = False
        m[carve] = 0
    return vol


ANIS = (16.0, 16.0, 40.0)


def _crop_field(vol, lab, init_fn, mode, clamp=False, conv="exact",
                okmask=None, nodecost=None, rounds=8):
    """Per-label crop relaxation via the crop engine's primitive."""
    pos = np.argwhere(vol == lab)
    mn, mx = pos.min(0), pos.max(0)
    sl = tuple(slice(a, b + 1) for a, b in zip(mn, mx))
    fg = jnp.asarray(vol[sl] == lab)
    d0 = jnp.asarray(init_fn(sl))
    ok = fg if okmask is None else (fg & jnp.asarray(okmask[sl]))
    nc = None if nodecost is None else jnp.asarray(
        np.where(vol[sl] == lab, nodecost[sl], np.inf).astype(np.float32))
    out, convf = _relax_rounds(d0, ok, nc, ANIS, rounds,
                               clamp_positive=clamp, conv=conv)
    return np.asarray(out), sl, np.asarray(fg)


def test_euclid_matches_crop_relax():
    vol = _three_blob_volume()
    cc_v = gsweep.MaskViews(jnp.asarray(vol))

    # one source per label: the lexicographically-first voxel
    d0 = np.full(vol.shape, np.inf, dtype=np.float32)
    srcs = {}
    for lab in (1, 2, 3):
        p = np.argwhere(vol == lab)[0]
        srcs[lab] = p
        d0[tuple(p)] = 0.0

    out, convf = gsweep.relax_full(
        jnp.asarray(d0), cc_v, None, None, ANIS, rounds=8, mode="euclid")
    out = np.asarray(out)
    assert bool(convf)

    for lab in (1, 2, 3):
        def init(sl):
            d = np.full(vol[sl].shape, np.inf, dtype=np.float32)
            d[tuple(srcs[lab] - [s.start for s in sl])] = 0.0
            return d

        ref, sl, fg = _crop_field(vol, lab, init, "euclid")
        np.testing.assert_array_equal(out[sl][fg], ref[fg])


def test_node_mode_matches_crop_relax():
    vol = _three_blob_volume()
    rng = np.random.RandomState(3)
    pdrf = (rng.rand(*vol.shape).astype(np.float32) * 100 + 1)
    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    nc_v = gsweep.MaskViews(
        jnp.asarray(np.where(vol > 0, pdrf, np.inf).astype(np.float32)))

    d0 = np.full(vol.shape, np.inf, dtype=np.float32)
    srcs = {}
    for lab in (1, 2, 3):
        p = np.argwhere(vol == lab)[-1]
        srcs[lab] = p
        d0[tuple(p)] = 0.0

    out, convf = gsweep.relax_full(
        jnp.asarray(d0), cc_v, nc_v, None, ANIS, rounds=8, mode="node")
    out = np.asarray(out)
    assert bool(convf)

    for lab in (1, 2, 3):
        def init(sl):
            d = np.full(vol[sl].shape, np.inf, dtype=np.float32)
            d[tuple(srcs[lab] - [s.start for s in sl])] = 0.0
            return d

        ref, sl, fg = _crop_field(vol, lab, init, "node", nodecost=pdrf)
        np.testing.assert_array_equal(out[sl][fg], ref[fg])


def test_ball_mode_matches_crop_relax():
    """clamp_positive + okmask: the rolling-ball invalidation field."""
    vol = _three_blob_volume()
    rng = np.random.RandomState(11)
    valid = (rng.rand(*vol.shape) < 0.8) & (vol > 0)

    d0 = np.full(vol.shape, np.inf, dtype=np.float32)
    srcs = {}
    for lab in (1, 2, 3):
        p = np.argwhere(vol == lab)[2]
        srcs[lab] = p
        d0[tuple(p)] = -80.0  # ball radius 80nm
        valid[tuple(p)] = True

    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    ok_v = gsweep.MaskViews(jnp.asarray(valid.astype(np.uint8)))

    out, convf = gsweep.relax_full(
        jnp.asarray(d0), cc_v, None, ok_v, ANIS, rounds=8, mode="euclid",
        clamp_positive=True, conv="negative")
    out = np.asarray(out)
    assert bool(convf)

    for lab in (1, 2, 3):
        def init(sl):
            d = np.full(vol[sl].shape, np.inf, dtype=np.float32)
            d[tuple(srcs[lab] - [s.start for s in sl])] = -80.0
            return d

        ref, sl, fg = _crop_field(vol, lab, init, "euclid", clamp=True,
                                  conv="negative", okmask=valid)
        got = out[sl]
        # compare the negative (= ball) sets and their values
        np.testing.assert_array_equal(
            np.where(got[fg] <= 0, got[fg], np.inf),
            np.where(ref[fg] <= 0, ref[fg], np.inf),
        )


def test_maxflood_broadcasts_per_label_max():
    vol = _three_blob_volume()
    rng = np.random.RandomState(5)
    dbf = np.where(vol > 0, rng.rand(*vol.shape).astype(np.float32) * 50, 0)

    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    d0 = jnp.asarray(np.where(vol > 0, dbf, -np.inf).astype(np.float32))
    out, convf = gsweep.relax_full(
        d0, cc_v, None, None, ANIS, rounds=8, mode="maxflood")
    out = np.asarray(out)
    assert bool(convf)

    for lab in (1, 2, 3):
        m = vol == lab
        assert np.allclose(out[m], dbf[m].max())


def test_unconverged_flag_on_too_few_rounds():
    """A winding component needs more rounds than a convex one; with
    rounds=0 the convergence flag must read False (one check round runs)."""
    vol = np.zeros((30, 6, 6), dtype=np.int32)
    vol[:, 1, 1] = 1
    vol[0:30:4, 1:5, 1] = 1  # comb: many direction reversals
    d0 = np.full(vol.shape, np.inf, dtype=np.float32)
    d0[(0, 1, 1)] = 0.0
    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    out, convf = gsweep.relax_full(
        jnp.asarray(d0), cc_v, None, None, ANIS, rounds=0, mode="euclid")
    assert not bool(convf)


def test_minid_ccl_pallas_matches_scan_and_scipy():
    """The gsweep minid mode (CCL on the full-plane Pallas engine,
    interpret mode here) must produce the same components as the scan
    stage and scipy's 26-connected labeling — including labels with the
    uint32 high bit set (bitcast mask path)."""
    import scipy.ndimage as ndi

    from kimimaro_tpu.ops import ccl, pallas_sweep

    rng = np.random.RandomState(11)
    vol = np.zeros((22, 17, 13), dtype=np.uint32)
    vol[2:9, 2:9, 2:7] = 7
    vol[2:9, 2:9, 8:12] = 7          # same label, separate component
    vol[12:20, 3:12, 3:12] = 0x80000001  # high bit set
    vol[vol != 0] &= np.where(rng.rand(*vol.shape) < 0.1, 0, 0xFFFFFFFF
                              ).astype(np.uint32)[vol != 0]

    def n_components(cc):
        cc = np.asarray(cc)
        return len(np.unique(cc[cc != 0]))

    # scipy oracle per label (26-connectivity)
    expected = 0
    for lab in np.unique(vol[vol != 0]):
        _, k = ndi.label(vol == lab, structure=np.ones((3, 3, 3)))
        expected += k

    # scan path (CPU default)
    cc_scan = ccl.connected_components(jnp.asarray(vol))
    assert n_components(cc_scan) == expected

    # Pallas interpret path
    prev_force = gsweep._FORCE
    prev_interp = pallas_sweep.INTERPRET
    gsweep._FORCE = "pallas"
    pallas_sweep.INTERPRET = True
    ccl._ccl_stage_gsweep._clear_cache()
    try:
        cc_pal = ccl.connected_components(jnp.asarray(vol))
    finally:
        gsweep._FORCE = prev_force
        pallas_sweep.INTERPRET = prev_interp
        ccl._ccl_stage_gsweep._clear_cache()
    np.testing.assert_array_equal(np.asarray(cc_scan), np.asarray(cc_pal))


def _force_pallas_interpret():
    from kimimaro_tpu.ops import pallas_sweep

    prev = (gsweep._FORCE, pallas_sweep.INTERPRET)
    gsweep._FORCE = "pallas"
    pallas_sweep.INTERPRET = True

    def restore():
        gsweep._FORCE, pallas_sweep.INTERPRET = prev

    return restore


def test_dual_ball_rail_matches_separate():
    """The fused ball+rail kernel (gengine's per-iteration pair) must be
    bit-identical per field to the two single-field relaxes, including
    the change masks and the joint escalation."""
    vol = _three_blob_volume()
    rng = np.random.RandomState(3)
    valid = (rng.rand(*vol.shape) < 0.8) & (vol > 0)
    pdrf = np.where(vol > 0, rng.rand(*vol.shape).astype(np.float32) * 9,
                    np.inf).astype(np.float32)

    ball0 = np.full(vol.shape, np.inf, dtype=np.float32)
    rail0 = np.full(vol.shape, np.inf, dtype=np.float32)
    for lab in (1, 2, 3):
        p = np.argwhere(vol == lab)
        ball0[tuple(p[1])] = -70.0
        valid[tuple(p[1])] = True
        rail0[tuple(p[-1])] = 0.0
        pdrf[tuple(p[-1])] = 0.0

    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    ok_v = gsweep.MaskViews(jnp.asarray(valid.astype(np.uint8)))
    nc_v = gsweep.MaskViews(jnp.asarray(pdrf))

    restore = _force_pallas_interpret()
    try:
        for rounds in (1, 3):
            (bd, rd), (bm, rm) = gsweep.relax_escalated_dual(
                jnp.asarray(ball0), jnp.asarray(rail0), cc_v, nc_v, ok_v,
                ANIS, rounds, kind="ball_rail", extra_stages=2,
                extra_rounds=2)
            bd_s, bm_s = gsweep.relax_escalated(
                jnp.asarray(ball0), cc_v, None, ok_v, ANIS, rounds,
                mode="euclid", clamp_positive=True, conv="negative",
                extra_stages=2, extra_rounds=2)
            rd_s, rm_s = gsweep.relax_escalated(
                jnp.asarray(rail0), cc_v, nc_v, None, ANIS, rounds,
                mode="node", extra_stages=2, extra_rounds=2)
            np.testing.assert_array_equal(np.asarray(bd), np.asarray(bd_s))
            np.testing.assert_array_equal(np.asarray(rd), np.asarray(rd_s))
            # joint escalation may run extra (no-op) stages for a field the
            # separate path stopped escalating, so compare the DECISION the
            # masks drive (any change at all), not the raw masks
            assert bool(np.asarray(bm).any()) == bool(np.asarray(bm_s).any())
            assert bool(np.asarray(rm).any()) == bool(np.asarray(rm_s).any())
    finally:
        restore()


def test_dual_max2_matches_separate():
    vol = _three_blob_volume()
    rng = np.random.RandomState(9)
    a0 = np.where(vol > 0, rng.rand(*vol.shape).astype(np.float32) * 50,
                  -np.inf).astype(np.float32)
    b0 = np.where(vol > 0, rng.rand(*vol.shape).astype(np.float32) * 7,
                  -np.inf).astype(np.float32)
    cc_v = gsweep.MaskViews(jnp.asarray(vol))

    restore = _force_pallas_interpret()
    try:
        (af, bf), (am, bm) = gsweep.relax_full_dual(
            jnp.asarray(a0), jnp.asarray(b0), cc_v, None, None, ANIS, 8,
            kind="max2")
        af_s, am_s = gsweep.relax_full(
            jnp.asarray(a0), cc_v, None, None, ANIS, 8, mode="maxflood",
            return_mask=True)
        bf_s, bm_s = gsweep.relax_full(
            jnp.asarray(b0), cc_v, None, None, ANIS, 8, mode="maxflood",
            return_mask=True)
        np.testing.assert_array_equal(np.asarray(af), np.asarray(af_s))
        np.testing.assert_array_equal(np.asarray(bf), np.asarray(bf_s))
        np.testing.assert_array_equal(np.asarray(am), np.asarray(am_s))
        np.testing.assert_array_equal(np.asarray(bm), np.asarray(bm_s))
    finally:
        restore()


def test_dual_fallback_matches_fused():
    """Off the Pallas path relax_full_dual runs the two separate relaxes;
    the fused interpret-mode kernel must agree with that fallback."""
    vol = _three_blob_volume()
    rng = np.random.RandomState(13)
    valid = ((rng.rand(*vol.shape) < 0.7) & (vol > 0))
    pdrf = np.where(vol > 0, rng.rand(*vol.shape).astype(np.float32) * 3,
                    np.inf).astype(np.float32)
    ball0 = np.full(vol.shape, np.inf, dtype=np.float32)
    rail0 = np.full(vol.shape, np.inf, dtype=np.float32)
    for lab in (1, 2, 3):
        p = np.argwhere(vol == lab)
        ball0[tuple(p[0])] = -60.0
        valid[tuple(p[0])] = True
        rail0[tuple(p[len(p) // 2])] = 0.0

    cc_v = gsweep.MaskViews(jnp.asarray(vol))
    ok_v = gsweep.MaskViews(jnp.asarray(valid.astype(np.uint8)))
    nc_v = gsweep.MaskViews(jnp.asarray(pdrf))

    args = (jnp.asarray(ball0), jnp.asarray(rail0), cc_v, nc_v, ok_v,
            ANIS, 6)
    (a_cpu, b_cpu), (ma_cpu, mb_cpu) = gsweep.relax_full_dual(
        *args, kind="ball_rail")
    restore = _force_pallas_interpret()
    try:
        (a_pal, b_pal), (ma_pal, mb_pal) = gsweep.relax_full_dual(
            *args, kind="ball_rail")
    finally:
        restore()
    np.testing.assert_array_equal(np.asarray(a_cpu), np.asarray(a_pal))
    np.testing.assert_array_equal(np.asarray(b_cpu), np.asarray(b_pal))
    np.testing.assert_array_equal(np.asarray(ma_cpu), np.asarray(ma_pal))
    np.testing.assert_array_equal(np.asarray(mb_cpu), np.asarray(mb_pal))
