"""Batched device trace engine.

The reference parallelizes per-label TEASAR with a process pool over POSIX
shared memory (/root/reference/kimimaro/intake.py:344-432). The TPU-native
equivalent: ONE jitted kernel executes the complete per-label trace
(crop -> soma detect/hole-fill/re-EDT -> root -> DAF -> PDRF -> path loop
with rolling-ball invalidation -> radii) for a BATCH of labels via vmap,
with the full cc/dbf volumes device-resident. Labels are bucketed by
padded crop shape so a bounded set of kernel shapes compiles.

This collapses per-label host<->device round trips (which dominate over a
tunneled TPU: ~40-90 ms each) into ~3 fetches per batch of labels.
Reference semantics per stage are pinned in kimimaro_tpu.trace; this module
is its batched re-expression.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.fused_trace import _chase, _relax_rounds, RELAX_ROUNDS, INF
from .ops.geodesic import _sweep
from .skeleton import Skeleton

T_CAP = 16     # manual-target slots per lane (beyond -> host fallback)
K_CAP = 64     # path rows per lane (overflow -> host fallback)
B_LANES = 64   # max lanes per kernel call
# Bound lanes x crop-voxels per launch (HBM working set: ~10 live arrays
# x 4 B/voxel-lane). The batched sweeps lower to the chunked Pallas kernel
# (ops.pallas_sweep.sweep_axis0_batched) on TPU, verified bit-identical to
# solo execution at 32 x (128,128,64); XLA's own vmapped-scan lowering is
# NOT trusted at width >= 8 (it diverges -- see ops.geodesic._axis0_sweep_core).
# Every engine result is additionally gated by _paths_structurally_valid,
# so an over-generous budget degrades to host fallback, never silent
# corruption.
MAX_VOXEL_LANES = 32 * 1024 * 1024
import os as _os
if _os.environ.get("KIMIMARO_TPU_MAX_VOXEL_LANES"):
    MAX_VOXEL_LANES = int(_os.environ["KIMIMARO_TPU_MAX_VOXEL_LANES"])


def _lanes_for(bshape: Tuple[int, int, int], n_jobs: int) -> int:
    """Lane count for one launch: a power of two covering n_jobs, bounded
    by B_LANES and by the per-launch voxel-lane budget."""
    vox = int(np.prod(bshape))
    b = max(1, min(B_LANES, MAX_VOXEL_LANES // max(vox, 1)))
    # no padding waste: a 3-job bucket runs 4 lanes, not 64
    p = 1
    while p < min(b, n_jobs):
        p <<= 1
    return p


# --------------------------------------------------------------------------- #
# In-kernel helpers


def _crop_fill(fg, anisotropy, rounds: int = 12):
    """Border-seeded background flood (6-connected) -> filled foreground.
    Device form of fill_voids.fill (reference trace.py:108-110).

    Static-round sweeps + convergence flag (data-dependent while fixpoints
    miscompile on TPU — see ops.fused_trace.RELAX_ROUNDS). Returns
    (filled, converged)."""
    bg = ~fg
    border = jnp.zeros(fg.shape, dtype=bool)
    for axis in range(3):
        border = border.at[(slice(None),) * axis + (0,)].set(True)
        border = border.at[(slice(None),) * axis + (fg.shape[axis] - 1,)].set(True)
    init = jnp.where(border & bg, 0.0, INF)

    def sweep6(d, axis, direction):
        dd = jnp.moveaxis(d, axis, 0)
        mm = jnp.moveaxis(bg, axis, 0)
        if direction < 0:
            dd, mm = dd[::-1], mm[::-1]

        def step(prev, x):
            cur, okc = x
            new = jnp.where(okc, jnp.minimum(cur, prev + 1.0), INF)
            return new, new

        _, rest = jax.lax.scan(step, dd[0], (dd[1:], mm[1:]))
        out = jnp.concatenate([dd[:1], rest], axis=0)
        if direction < 0:
            out = out[::-1]
        return jnp.moveaxis(out, 0, axis)

    def one_round(d):
        for axis in range(3):
            for direction in (1, -1):
                d = sweep6(d, axis, direction)
        return d

    def body(carry, _):
        d, _ = carry
        nd = one_round(d)
        # reachability-stall convergence: a full round with no newly
        # reached voxel means no unreached voxel borders a reached one
        # (sound for the flood; exact distances are never consumed)
        return (nd, jnp.any(jnp.isfinite(nd) != jnp.isfinite(d))), None

    (d, changed), _ = jax.lax.scan(
        body, (jnp.where(bg, init, INF), jnp.bool_(True)), None,
        length=int(rounds) + 1,
    )
    reached = jnp.isfinite(d)
    return fg | (bg & ~reached), ~changed


_AXIS_UNIT = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def _crop_edtsq_banded(labels, anisotropy, black_border, voxel_graph=None,
                       band_cap: int = None):
    """Squared multi-label EDT of a crop with static bands (in-kernel form:
    no host escalation). Exact when every distance fits the band; axes
    longer than band_cap+1 can truncate (a refilled soma thicker than the
    band — reference exactness contract: re-EDT after refill,
    trace.py:112-117), so the second return is a traced exactness flag:
    a truncated voxel's squared distance necessarily exceeds
    min_clipped_axis (w*band)^2, so any foreground value above that bound
    marks the result inexact and the caller escalates. black_border is a
    traced bool. `voxel_graph` walls break runs like label changes (same
    wall-segment cumsum as ops.edt.edtsq)."""
    from .ops.stencils import graph_allows

    if band_cap is None:
        band_cap = int(_os.environ.get("KIMIMARO_TPU_EDT_BAND", "128"))
    shape = labels.shape
    d = jnp.full(shape, np.float32(3.4e37), dtype=jnp.float32)
    BIG = np.float32(3.4e37)

    for axis in range(3):
        w = np.float32(anisotropy[axis])
        n = shape[axis]
        if n == 1:
            d = jnp.where(black_border, jnp.minimum(d, w * w), d)
            continue
        band = int(min(n - 1, band_cap))
        lab_t = jnp.moveaxis(labels, axis, -1).reshape(-1, n)
        d_t = jnp.moveaxis(d, axis, -1).reshape(-1, n)

        B, _ = d_t.shape
        d_p = jnp.pad(d_t, ((0, 0), (band, band)), constant_values=BIG)
        l_p = jnp.pad(lab_t, ((0, 0), (band, band)), constant_values=0)
        v_p = jnp.pad(
            jnp.ones((B, n), dtype=bool), ((0, 0), (band, band)),
            constant_values=False,
        )
        if voxel_graph is not None:
            allow = graph_allows(voxel_graph, _AXIS_UNIT[axis])
            allow_t = jnp.moveaxis(allow, axis, -1).reshape(-1, n)
            blocked = jnp.concatenate(
                [jnp.zeros((B, 1), dtype=bool), ~allow_t[:, :-1]], axis=1
            )
            wall_t = jnp.cumsum(blocked.astype(jnp.int32), axis=1)
            w_p = jnp.pad(wall_t, ((0, 0), (band, band)), constant_values=-1)
        else:
            wall_t = w_p = None
        oob_g = jnp.where(black_border, 0.0, BIG)

        def body(best, o):
            d_s = jax.lax.dynamic_slice(d_p, (0, o), (B, n))
            l_s = jax.lax.dynamic_slice(l_p, (0, o), (B, n))
            v_s = jax.lax.dynamic_slice(v_p, (0, o), (B, n))
            same = l_s == lab_t
            if w_p is not None:
                w_s = jax.lax.dynamic_slice(w_p, (0, o), (B, n))
                same = same & (w_s == wall_t)
            g = jnp.where(v_s, jnp.where(same, d_s, 0.0), oob_g)
            off = (o - band).astype(jnp.float32)
            return jnp.minimum(best, g + w * w * off * off), None

        best, _ = jax.lax.scan(
            body, jnp.full_like(d_t, BIG),
            jnp.arange(2 * band + 1, dtype=jnp.int32),
        )
        out = jnp.minimum(best, d_t).reshape(jnp.moveaxis(d, axis, -1).shape)
        d = jnp.moveaxis(out, -1, axis)
        d = jnp.where(labels == 0, 0.0, d)

    clipped = [
        (float(anisotropy[a]) * band_cap) ** 2
        for a in range(3) if shape[a] - 1 > band_cap
    ]
    if clipped:
        exact = ~jnp.any((labels != 0) & (d > np.float32(min(clipped))))
    else:
        exact = jnp.bool_(True)
    return d, exact


def _masked_argmax_coords(field, mask, shape):
    masked = jnp.where(mask, field, -INF)
    idx = jnp.argmax(masked)
    return jnp.stack(jnp.unravel_index(idx, shape)).astype(jnp.int32)


def _find_soma_root(dbf, dbf_max, shape):
    """Max-DBF voxel nearest the centroid of all maxima
    (reference trace.py:269-289)."""
    maxima = dbf >= dbf_max
    cnt = jnp.maximum(jnp.sum(maxima), 1)
    coords = [
        jax.lax.broadcasted_iota(jnp.float32, shape, a) for a in range(3)
    ]
    com = jnp.stack([jnp.sum(jnp.where(maxima, c, 0.0)) / cnt for c in coords])
    d2 = sum((c - com[a]) ** 2 for a, c in enumerate(coords))
    d2 = jnp.where(maxima, d2, INF)
    idx = jnp.argmin(d2)
    return jnp.stack(jnp.unravel_index(idx, shape)).astype(jnp.int32)


def _euclid_field(fg, src, anisotropy, rounds, voxel_graph=None):
    """Geodesic euclidean field from src. Returns (dist, converged)."""
    init = jnp.full(fg.shape, INF, dtype=jnp.float32)
    init = init.at[src[0], src[1], src[2]].set(0.0)
    return _relax_rounds(init, fg, None, anisotropy, rounds,
                         voxel_graph=voxel_graph)


# --------------------------------------------------------------------------- #
# One lane = one label, end to end


def _one_label(
    cc_full, dbf_full, vg_full,
    label_id, offset,
    before, n_before, after, n_after, root_in, has_root, max_paths_in,
    scale, const,
    soma_detection_threshold, soma_acceptance_threshold,
    soma_invalidation_scale, soma_invalidation_const,
    pdrf_scale,
    crop_shape: Tuple[int, int, int],
    anisotropy: Tuple[float, float, float],
    pdrf_exponent: int,
    fix_branching: bool,
    has_vg: bool,
    K: int, L: int,
    relax_rounds: int = RELAX_ROUNDS,
    soma_possible: bool = True,
):
    shape = crop_shape
    anis = jnp.asarray(anisotropy, dtype=jnp.float32)
    r_main = int(relax_rounds)
    # balls are near-convex and the rail re-relax starts warm, so they
    # run shorter than the main fields — but not so short that escalation
    # retries dominate (measured on the dense 512^3: ball=2/warm=1 retried
    # 30% of jobs; ball=6/warm=4 retried 0.1%)
    r_ball = max(3, r_main // 2)
    r_warm = max(2, r_main // 3)
    # bit per relaxation stage: 1=fill 2=probe 4=daf 8=rail 16=ball 32=warm
    # 64=banded re-EDT truncated (soma thicker than the band)
    nc_bits = jnp.int32(0)

    off3 = (offset[0], offset[1], offset[2])
    lab = jax.lax.dynamic_slice(cc_full, off3, shape)
    fg = (lab == label_id) & (label_id > 0)
    dbf = jnp.where(fg, jax.lax.dynamic_slice(dbf_full, off3, shape), 0.0)
    # self-touch walls ride along as a cropped bitfield (None when absent
    # so the no-graph kernels compile unchanged)
    vg = jax.lax.dynamic_slice(vg_full, off3, shape) if has_vg else None
    vg_pad = jnp.pad(vg, 1, constant_values=0) if has_vg else None
    lane_active = jnp.any(fg)

    dbf_max = jnp.max(dbf)

    # --- soma detection: hole fill + re-EDT (reference trace.py:104-119)
    def refill(args):
        fg0, dbf0 = args
        filled, conv_f = _crop_fill(fg0, anisotropy, rounds=r_main)
        n_filled = jnp.sum(filled) - jnp.sum(fg0)
        bb = jnp.all(filled)
        dsq, edt_ok = _crop_edtsq_banded(
            filled.astype(jnp.uint8), anisotropy, bb, vg)
        dbf1 = jnp.where(filled, jnp.sqrt(dsq), 0.0)
        take = n_filled > 0
        return (
            jnp.where(take, filled, fg0),
            jnp.where(take, dbf1, dbf0),
            conv_f,
            edt_ok | ~take,
        )

    fg, dbf, conv_f, edt_ok = jax.lax.cond(
        dbf_max > soma_detection_threshold, refill,
        lambda a: (a[0], a[1], jnp.bool_(True), jnp.bool_(True)), (fg, dbf)
    )
    nc_bits = nc_bits | jnp.where(conv_f, 0, 1)
    nc_bits = nc_bits | jnp.where(edt_ok, 0, 64)
    dbf_max = jnp.max(dbf)
    if soma_possible:
        soma_mode = dbf_max > soma_acceptance_threshold
    else:
        # host verified dbf_max below both thresholds: the refill,
        # root-ball, and path-cull branches compile away entirely
        soma_mode = jnp.bool_(False)
    soma_radius = jnp.where(
        soma_mode,
        dbf_max * soma_invalidation_scale + soma_invalidation_const,
        0.0,
    )

    # --- root selection (reference trace.py:121-134)
    soma_root = _find_soma_root(dbf, dbf_max, shape)
    first_idx = jnp.argmax(fg.ravel())
    first_vox = jnp.stack(jnp.unravel_index(first_idx, shape)).astype(jnp.int32)
    d_probe, conv_p = _euclid_field(fg, first_vox, anisotropy, r_main, vg)
    nc_bits = nc_bits | jnp.where(conv_p, 0, 2)
    auto_root = _masked_argmax_coords(
        jnp.where(jnp.isfinite(d_probe), d_probe, -INF), fg, shape
    )
    root = jnp.where(
        soma_mode, soma_root, jnp.where(has_root, root_in, auto_root)
    )

    # --- DAF + PDRF (reference trace.py:138-148,315-356)
    dbf_inf = jnp.where(dbf == 0, INF, dbf)
    daf, conv_d = _euclid_field(fg, root, anisotropy, r_main, vg)
    nc_bits = nc_bits | jnp.where(conv_d, 0, 4)
    daf = jnp.where(jnp.isfinite(daf), daf, 0.0)
    daf_target = _masked_argmax_coords(daf, fg, shape)
    max_daf = daf[daf_target[0], daf_target[1], daf_target[2]]

    m = 1.0 / jnp.maximum(dbf_max, 1e-30) ** 1.01
    p = 1.0 - dbf_inf * m
    e = int(pdrf_exponent)
    if e > 0 and (e & (e - 1)) == 0:
        while e > 1:
            p = p * p
            e >>= 1
    else:
        p = jnp.power(p, e)
    pdrf = p * pdrf_scale + jnp.where(max_daf > 0, daf / jnp.maximum(max_daf, 1e-30), 0.0)
    pdrf = pdrf.astype(jnp.float32)

    # --- soma-mode root ball (reference trace.py:160-168)
    valid = fg

    def soma_ball(valid):
        r = soma_invalidation_scale * dbf[root[0], root[1], root[2]] + soma_invalidation_const
        init = jnp.full(shape, INF, dtype=jnp.float32)
        init = init.at[root[0], root[1], root[2]].set(-r)
        ok = valid.at[root[0], root[1], root[2]].set(True)
        bd, conv_s = _relax_rounds(init, ok, None, anisotropy, r_ball,
                                   clamp_positive=True, voxel_graph=vg,
                                   conv="negative")
        return valid & ~(bd <= 0.0), conv_s

    if soma_possible:
        valid, conv_s = jax.lax.cond(
            soma_mode, soma_ball, lambda v: (v, jnp.bool_(True)), valid
        )
        nc_bits = nc_bits | jnp.where(conv_s, 0, 16)
    valid_count = jnp.sum(valid).astype(jnp.int32)

    # --- target bookkeeping: slot0 holds either the user root (soma mode:
    # popped last, reference trace.py:121-123) or the auto DAF target
    # (popped first when no manual targets, reference trace.py:170-172)
    use_root_slot = soma_mode & has_root
    use_daf_slot = (~soma_mode) & (n_before == 0)
    slot0_used = use_root_slot | use_daf_slot
    slot0 = jnp.where(use_root_slot, root_in, daf_target)
    # layout [slot0, b0..b_{nb-1}]; pops run b_{nb-1}..b0 then slot0 (if
    # used): with counter c, the pop index is c - slot0_used
    slot0_i = slot0_used.astype(jnp.int32)
    before_ext = jnp.concatenate([slot0[None, :], before], axis=0)
    nb0 = jnp.where(slot0_used, n_before + 1, n_before)
    nb0 = jnp.where(lane_active, nb0, 0)
    na0 = jnp.where(lane_active, n_after.astype(jnp.int32), 0)
    valid_count = jnp.where(lane_active, valid_count, 0)

    max_paths = jnp.where(max_paths_in > 0, max_paths_in, jnp.maximum(valid_count, 1))
    # reference compute_paths early-out (trace.py:217-218)
    blocked = (nb0 + na0) >= max_paths

    # --- initial rails + rail distance field
    pdrf = pdrf.at[root[0], root[1], root[2]].set(0.0)
    d0 = jnp.full(shape, INF, dtype=jnp.float32)
    d0 = d0.at[root[0], root[1], root[2]].set(0.0)
    d_rail, conv_r = _relax_rounds(d0, fg, pdrf, anisotropy, r_main,
                                   voxel_graph=vg)
    nc_bits = nc_bits | jnp.where(conv_r, 0, 8)

    paths0 = jnp.full((K, L, 3), -1, dtype=jnp.int32)
    lens0 = jnp.zeros((K,), dtype=jnp.int32)

    def cond(state):
        (k, valid, vc, pdrf, d_rail, nb, na, paths, lens, ov, nc) = state
        work = (vc > 0) | (nb > 0) | (na > 0)
        return (work & (k < jnp.minimum(max_paths, K)) & (~ov) & (nc == 0)
                & (~blocked))

    def body(state):
        (k, valid, vc, pdrf, d_rail, nb, na, paths, lens, ov, nc) = state

        use_before = nb > 0
        use_after = (~use_before) & (vc == 0)
        auto_t = _masked_argmax_coords(daf, valid, shape)
        bt = before_ext[jnp.maximum(nb - slot0_i, 0)]
        at = after[jnp.maximum(na - 1, 0)]
        target = jnp.where(use_before, bt, jnp.where(use_after, at, auto_t))
        nb = jnp.where(use_before, nb - 1, nb)
        na = jnp.where(use_after, na - 1, na)

        d_pad = jnp.pad(d_rail, 1, constant_values=INF)
        path, plen, reached = _chase(d_pad, target, L, vg_pad)
        ov = ov | (~reached)

        def cull(path):
            dvec = (path.astype(jnp.float32) - root.astype(jnp.float32)) * anis
            dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=1))
            idxs = jnp.arange(L)
            keep = ((dist > soma_radius) | (idxs == (plen - 1))) & (idxs < plen)
            return jnp.where(keep[:, None], path, -1)

        if soma_possible:
            path = jax.lax.cond(soma_mode, cull, lambda p: p, path)
        px, py, pz = path[:, 0], path[:, 1], path[:, 2]

        radii_b = scale * dbf.at[px, py, pz].get(mode="fill", fill_value=0.0) + const
        init = jnp.full(shape, INF, dtype=jnp.float32)
        init = init.at[px, py, pz].min(-radii_b, mode="drop")
        ok_inv = valid.at[px, py, pz].set(True, mode="drop")

        def invalidate(_):
            bd, conv_b = _relax_rounds(init, ok_inv, None, anisotropy, r_ball,
                                       clamp_positive=True, voxel_graph=vg,
                                       conv="negative")
            ball = bd <= 0.0
            return (valid & ~ball,
                    vc - jnp.sum(ball & valid).astype(jnp.int32), conv_b)

        valid, vc, conv_b = jax.lax.cond(
            vc > 0, invalidate, lambda _: (valid, vc, jnp.bool_(True)), None
        )
        nc = nc | jnp.where(conv_b, 0, 16)

        if fix_branching:
            pdrf = pdrf.at[px, py, pz].set(0.0, mode="drop")
            d_rail = d_rail.at[px, py, pz].set(0.0, mode="drop")
            d_rail, conv_w = _relax_rounds(d_rail, fg, pdrf, anisotropy,
                                           r_warm, voxel_graph=vg)
            nc = nc | jnp.where(conv_w, 0, 32)

        paths = paths.at[k].set(path)
        lens = lens.at[k].set(plen)
        return (k + 1, valid, vc, pdrf, d_rail, nb, na, paths, lens, ov, nc)

    state = (jnp.int32(0), valid, valid_count, pdrf, d_rail, nb0, na0,
             paths0, lens0, jnp.bool_(False),
             jnp.where(lane_active, nc_bits, 0))
    state = jax.lax.while_loop(cond, body, state)
    (k, valid, vc, pdrf, d_rail, nb, na, paths, lens, ov, nc) = state

    work_left = (vc > 0) | (nb > 0) | (na > 0)
    ov = ov | (work_left & (k >= K) & (k < max_paths) & (~blocked)
               & (nc == 0))

    # radii at path vertices from the (possibly refilled) DBF
    prx = paths.reshape(-1, 3)
    radii = dbf_inf.at[prx[:, 0], prx[:, 1], prx[:, 2]].get(
        mode="fill", fill_value=0.0
    ).reshape(K, L)

    return paths.astype(jnp.int16), lens, k, ov, nc, radii


@functools.partial(
    jax.jit,
    static_argnames=(
        "crop_shape", "anisotropy", "pdrf_exponent", "fix_branching",
        "has_vg", "K", "L", "relax_rounds", "soma_possible", "lane_crops",
    ),
)
def batched_trace_kernel(
    cc_full, dbf_full, vg_full,
    label_ids, offsets,
    before, n_before, after, n_after, root_in, has_root, max_paths_in,
    scale, const,
    soma_detection_threshold, soma_acceptance_threshold,
    soma_invalidation_scale, soma_invalidation_const,
    pdrf_scale,
    crop_shape: Tuple[int, int, int],
    anisotropy: Tuple[float, float, float],
    pdrf_exponent: int,
    fix_branching: bool,
    has_vg: bool,
    K: int,
    L: int,
    relax_rounds: int = RELAX_ROUNDS,
    soma_possible: bool = True,
    lane_crops: bool = False,
):
    """vmap of the full per-label trace over a batch of labels. The full
    cc/dbf volumes are broadcast (device-resident); every lane slices its
    own crop. With `lane_crops` the caller pre-gathered per-lane crops
    instead (cc_full/dbf_full are (B,) + crop_shape, offsets are zeros) —
    the multi-chip path uses this so one host never holds the volume."""
    fn = functools.partial(
        _one_label,
        crop_shape=crop_shape, anisotropy=anisotropy,
        pdrf_exponent=pdrf_exponent, fix_branching=fix_branching,
        has_vg=has_vg, K=K, L=L, relax_rounds=relax_rounds,
        soma_possible=soma_possible,
    )
    if lane_crops:
        if has_vg:
            # per-lane vg crops ride the lane axis; offsets are zeros so
            # _one_label's dynamic_slice over the crop is the identity
            return jax.vmap(
                lambda cc, dbf, vg, lid, off, b, nb, a, na, r, hr, mp: fn(
                    cc, dbf, vg, lid, off, b, nb, a, na, r, hr, mp,
                    scale, const,
                    soma_detection_threshold, soma_acceptance_threshold,
                    soma_invalidation_scale, soma_invalidation_const,
                    pdrf_scale,
                )
            )(cc_full, dbf_full, vg_full, label_ids, offsets, before,
              n_before, after, n_after, root_in, has_root, max_paths_in)
        return jax.vmap(
            lambda cc, dbf, lid, off, b, nb, a, na, r, hr, mp: fn(
                cc, dbf, vg_full, lid, off, b, nb, a, na, r, hr, mp,
                scale, const,
                soma_detection_threshold, soma_acceptance_threshold,
                soma_invalidation_scale, soma_invalidation_const,
                pdrf_scale,
            )
        )(cc_full, dbf_full, label_ids, offsets, before, n_before, after,
          n_after, root_in, has_root, max_paths_in)
    return jax.vmap(
        lambda lid, off, b, nb, a, na, r, hr, mp: fn(
            cc_full, dbf_full, vg_full, lid, off, b, nb, a, na, r, hr, mp,
            scale, const,
            soma_detection_threshold, soma_acceptance_threshold,
            soma_invalidation_scale, soma_invalidation_const, pdrf_scale,
        )
    )(label_ids, offsets, before, n_before, after, n_after, root_in,
      has_root, max_paths_in)


# --------------------------------------------------------------------------- #
# Host driver


def _bucket_dim(n: int) -> int:
    b = 16
    while b < n:
        b <<= 1
    return b


def _paths_structurally_valid(path_list) -> bool:
    """TEASAR tree invariants, checked on host from fetched paths:
    every step is a 26-neighbor move, and each path's rail anchor (first
    vertex, rail-first order) lies on the tree built by earlier paths
    (the first path's anchor is the root). Catches wandering chases from
    a divergent rail field regardless of what the device kernel reported."""
    tree = None
    for verts, _ in path_list:
        if len(verts) == 0:
            continue
        steps = np.abs(np.diff(verts, axis=0))
        if steps.size and int(steps.max()) > 1:
            return False
        if tree is None:
            tree = set(map(tuple, verts.tolist()))
            continue
        if tuple(verts[0].tolist()) not in tree:
            return False
        tree.update(map(tuple, verts.tolist()))
    return True


def trace_batched(
    cc_dev,
    dbf_dev,
    jobs: List[dict],
    teasar_params: dict,
    anisotropy: Sequence[float],
    fix_branching: bool,
    progress: bool = False,
    voxel_graph=None,
    crop_source=None,
) -> Tuple[Dict[int, List[Tuple[np.ndarray, np.ndarray]]], List[dict]]:
    """Run per-label traces in device batches.

    jobs: [{segid, offset (3,), shape (3,), before [(x,y,z)...],
            after [...], root (x,y,z)|None}]
    Returns ({segid: [(path_vertices, path_radii), ...]}, fallback_jobs).
    Paths are rail-first int64 voxel coords in crop frame + per-vertex
    radii; callers translate/scale.

    `crop_source(crop_offs (B,3) int64, n_real, bshape) -> (cc, dbf)`
    (each (B,)+bshape jnp) replaces on-device slicing of cc_dev/dbf_dev —
    the multi-chip driver supplies one that gathers each label's crop off
    the mesh, so no single host/chip ever holds the full volume.
    """
    p = dict(teasar_params)
    scale = float(p.get("scale", 10))
    const = float(p.get("const", 10))
    pdrf_scale = float(p.get("pdrf_scale", 5000))
    pdrf_exponent = int(p.get("pdrf_exponent", 16))
    sdt = float(p.get("soma_detection_threshold", 1100))
    sat = float(p.get("soma_acceptance_threshold", 4000))
    sis = float(p.get("soma_invalidation_scale", 0.5))
    sic = float(p.get("soma_invalidation_const", 0))
    max_paths = p.get("max_paths", None)
    anis = tuple(float(a) for a in anisotropy)

    has_vg = voxel_graph is not None
    vg_full = (
        jnp.asarray(voxel_graph).astype(jnp.uint32)
        if has_vg
        else jnp.zeros((1, 1, 1), dtype=jnp.uint32)
    )

    vol_shape = cc_dev.shape

    # the soma refill/re-EDT branch is the kernel's most expensive code;
    # labels whose DBF max (host-known) cannot reach either threshold get
    # a kernel variant with those branches compiled away
    soma_cut = min(sdt, sat)

    # bucket jobs by (padded crop shape, soma possibility)
    buckets: Dict[Tuple[Tuple[int, int, int], bool], List[dict]] = {}
    fallback: List[dict] = []
    for job in jobs:
        if len(job["before"]) > T_CAP or len(job["after"]) > T_CAP:
            fallback.append(job)
            continue
        bshape = tuple(
            min(_bucket_dim(int(s)), int(vs))
            for s, vs in zip(job["shape"], vol_shape)
        )
        # clamp the offset so the padded crop stays in bounds
        off = np.minimum(
            np.asarray(job["offset"], dtype=np.int64),
            np.asarray(vol_shape) - np.asarray(bshape),
        )
        off = np.maximum(off, 0)
        job = dict(job)
        job["crop_off"] = off
        dmx = job.get("dbfmax")
        soma = (dmx is None) or (float(dmx) > soma_cut)
        buckets.setdefault((bshape, soma), []).append(job)

    results: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}

    import os
    debug = os.environ.get("KIMIMARO_TPU_DEBUG_ENGINE", "") not in ("", "0")

    from tqdm import tqdm

    pbar = tqdm(
        total=sum(len(g) for g in buckets.values()),
        disable=(not progress), desc="Skeletonizing Labels",
    )

    def run_pass(pass_buckets, relax_rounds):
        """Dispatch every bucket at the given static relax_rounds; jobs
        whose lane flags non-convergence are returned for escalation.
        Dispatches one batch ahead of each fetch so transfer latency
        overlaps the next batch's device time (the tunnel's d2h roundtrip
        is the scarce resource)."""
        retry: List[dict] = []
        pending = None

        def drain(pending):
            chunk, outs = pending
            paths, lens, n_paths, overflow, nonconv, radii = outs
            header = np.asarray(jax.device_get(jnp.stack(
                [n_paths.astype(jnp.int32),
                 overflow.astype(jnp.int32),
                 nonconv.astype(jnp.int32),
                 jnp.max(lens, axis=1).astype(jnp.int32)], axis=1
            )))
            if debug:
                print(f"[engine] drain B={len(chunk)} "
                      f"n_paths={header[:, 0].tolist()} "
                      f"ov={header[:, 1].tolist()} "
                      f"nc={header[:, 2].tolist()}", flush=True)
            max_n = int(header[:, 0].max()) if len(header) else 0
            max_l = int(header[:, 3].max()) if len(header) else 0
            if max_n > 0 and max_l > 0:
                paths_np, radii_np = jax.device_get(
                    (paths[:, :max_n, :max_l], radii[:, :max_n, :max_l])
                )
            else:
                paths_np = np.zeros((len(chunk), 0, 0, 3), np.int16)
                radii_np = np.zeros((len(chunk), 0, 0), np.float32)

            done = 0
            for j, job in enumerate(chunk):
                if header[j, 2]:  # unconverged relaxation -> escalate
                    retry.append(job)
                    continue
                if header[j, 1]:  # capacity overflow -> host fallback
                    fallback.append(job)
                    done += 1
                    continue
                done += 1
                n = int(header[j, 0])
                out = []
                for kk in range(n):
                    row = paths_np[j, kk].astype(np.int64)
                    rad = radii_np[j, kk]
                    m = row[:, 0] >= 0
                    row, rad = row[m], rad[m]
                    # device rows run target->rail; reference rail-first
                    row, rad = row[::-1], rad[::-1]
                    # translate crop frame -> the job's bbox frame
                    row = row + (job["crop_off"] - np.asarray(job["offset"]))
                    out.append((row, rad))
                if not _paths_structurally_valid(out):
                    # compiler-independent correctness gate: a divergent
                    # rail field (the TPU miscompile class) yields paths
                    # that teleport or miss the growing tree — send the
                    # label down the exact host path instead
                    fallback.append(job)
                    continue
                results[job["segid"]] = out
            pbar.update(done)

        import time as _time

        _t_bucket = _time.perf_counter()
        for (bshape, soma), group in sorted(pass_buckets.items()):
            K = K_CAP
            L = max(int(2 * sum(bshape)), 64)
            lanes = _lanes_for(bshape, len(group))
            if debug:
                now = _time.perf_counter()
                print(f"[engine] bucket {bshape} soma={soma} "
                      f"jobs={len(group)} K={K} "
                      f"L={L} lanes={lanes} rounds={relax_rounds} "
                      f"t+{now - _t_bucket:.1f}s", flush=True)
            # group similar-cost labels together to limit vmap
            # stragglers: the batched while_loop runs to the max path
            # count over lanes, so sort by expected paths (voxels per
            # invalidation-ball volume), falling back to crop volume
            def _cost(j):
                cnt = j.get("count") or int(np.prod(j["shape"]))
                dmx = j.get("dbfmax")
                r_vox = max(float(dmx) / max(min(anis), 1e-6), 1.0) \
                    if dmx else 1.0
                return (-cnt / (r_vox ** 3), -int(np.prod(j["shape"])))

            group = sorted(group, key=_cost)
            for i in range(0, len(group), lanes):
                chunk = group[i: i + lanes]
                B = lanes
                lids = np.zeros(B, dtype=np.int32)
                offs = np.zeros((B, 3), dtype=np.int32)
                bef = np.full((B, T_CAP, 3), -1, dtype=np.int32)
                nbef = np.zeros(B, dtype=np.int32)
                aft = np.full((B, T_CAP, 3), -1, dtype=np.int32)
                naft = np.zeros(B, dtype=np.int32)
                roots = np.zeros((B, 3), dtype=np.int32)
                has_root = np.zeros(B, dtype=bool)
                mp = np.full(B, -1, dtype=np.int32)

                for j, job in enumerate(chunk):
                    lids[j] = job["segid"]
                    offs[j] = job["crop_off"]
                    # targets/roots arrive in the job's bbox frame; the
                    # device crop starts at crop_off (clamped padding), so
                    # shift them
                    shift = np.asarray(job["offset"]) - job["crop_off"]
                    for t_i, t in enumerate(job["before"]):
                        bef[j, t_i] = np.asarray(t) + shift
                    nbef[j] = len(job["before"])
                    for t_i, t in enumerate(job["after"]):
                        aft[j, t_i] = np.asarray(t) + shift
                    naft[j] = len(job["after"])
                    if job.get("root") is not None:
                        roots[j] = np.asarray(job["root"]) + shift
                        has_root[j] = True
                    if max_paths is not None:
                        mp[j] = int(max_paths)

                if crop_source is not None:
                    got = crop_source(
                        offs.astype(np.int64), len(chunk), bshape)
                    # (cc, dbf) or (cc, dbf, vg) — per-lane vg crops ride
                    # the vmapped lane axis (sharded voxel_graph path)
                    cc_in, dbf_in = got[0], got[1]
                    if has_vg and len(got) <= 2:
                        raise ValueError(
                            "trace_batched: voxel_graph with crop_source "
                            "requires the source to return (cc, dbf, vg) "
                            "per-lane crops")
                    vg_in = got[2] if has_vg else vg_full
                    offs = np.zeros_like(offs)
                    lane_crops = True
                else:
                    cc_in, dbf_in, vg_in = cc_dev, dbf_dev, vg_full
                    lane_crops = False

                from .utils import progcache

                statics = dict(
                    crop_shape=bshape, anisotropy=anis,
                    pdrf_exponent=pdrf_exponent,
                    fix_branching=bool(fix_branching),
                    has_vg=has_vg, K=K, L=L,
                    relax_rounds=relax_rounds,
                    soma_possible=soma,
                    lane_crops=lane_crops,
                )
                outs = None
                for attempt in range(3):
                    try:
                        outs = progcache.call(
                            "batched_trace_kernel", batched_trace_kernel,
                            statics,
                            cc_in, dbf_in, vg_in,
                            jnp.asarray(lids), jnp.asarray(offs),
                            jnp.asarray(bef), jnp.asarray(nbef),
                            jnp.asarray(aft), jnp.asarray(naft),
                            jnp.asarray(roots), jnp.asarray(has_root),
                            jnp.asarray(mp),
                            jnp.float32(scale), jnp.float32(const),
                            jnp.float32(sdt), jnp.float32(sat),
                            jnp.float32(sis), jnp.float32(sic),
                            jnp.float32(pdrf_scale),
                        )
                        break
                    except jax.errors.JaxRuntimeError as e:
                        # the remote compile service occasionally drops a
                        # request mid-flight; retrying is cheap and the
                        # compilation cache keeps partial progress
                        if "remote_compile" not in str(e) or attempt == 2:
                            raise
                        import time as _time

                        _time.sleep(5.0 * (attempt + 1))
                if pending is not None:
                    drain(pending)
                pending = (chunk, outs)

        if pending is not None:
            drain(pending)
        return retry

    # escalation ladder: unconverged lanes re-run with doubled sweep
    # rounds; jobs still unconverged after the ladder take the host path
    todo = buckets
    n_retried = 0
    for mult in (1, 2, 4):
        retry = run_pass(todo, RELAX_ROUNDS * mult)
        if not retry:
            todo = {}
            break
        n_retried += len(retry)
        todo = {}
        for job in retry:
            bshape = tuple(
                min(_bucket_dim(int(sd)), int(vs))
                for sd, vs in zip(job["shape"], vol_shape)
            )
            dmx = job.get("dbfmax")
            soma = (dmx is None) or (float(dmx) > soma_cut)
            todo.setdefault((bshape, soma), []).append(job)
    else:
        leftovers = [j for g in todo.values() for j in g]
        fallback.extend(leftovers)
        pbar.update(len(leftovers))
        todo = {}

    pbar.close()
    try:
        from .utils import profiling
        profiling.count("relax_retries", n_retried)
    except Exception:
        pass

    return results, fallback


def paths_to_skeleton(path_list, anisotropy) -> Skeleton:
    """Paths+radii -> consolidated Skeleton with reference transform
    semantics (reference trace.py:182-193)."""
    skels = []
    radii_map = {}
    for verts, rads in path_list:
        if len(verts) == 0:
            continue
        skels.append(Skeleton.from_path(verts))
        for v, r in zip(verts, rads):
            radii_map[tuple(int(c) for c in v)] = float(r)
    if not skels:
        return Skeleton()
    skel = Skeleton.simple_merge(skels).consolidate()
    if not skel.empty():
        skel.radii = np.array(
            [radii_map.get(tuple(int(c) for c in v), 0.0) for v in skel.vertices],
            dtype=np.float32,
        )
    skel.transform = np.array(
        [[anisotropy[0], 0, 0, 0],
         [0, anisotropy[1], 0, 0],
         [0, 0, anisotropy[2], 0]], dtype=np.float32)
    return skel


def paths_to_skeletons_batched(results, offsets_by_segid, anisotropy):
    """Vectorized finalize: every label's paths -> consolidated Skeleton in
    ONE set of array passes (semantics identical to per-label
    paths_to_skeleton: from_path consecutive-dup fusion, consolidate's
    first-occurrence vertex dedup in (x,y,z)-sorted order, undirected edge
    dedup, disconnected-vertex removal, last-write-wins radii — reference
    trace.py:182-193). The per-label loop cost ~2 ms x thousands of labels;
    this replaces it with ~15 numpy passes over the concatenated paths.

    results: {segid: [(verts int (P,3) in bbox frame, radii (P,)), ...]}
    offsets_by_segid: {segid: (3,) bbox offset}
    Returns {segid: Skeleton} with GLOBAL voxel vertices (not yet scaled
    to physical space; caller applies anisotropy/transform bookkeeping).
    """
    seg_list = [s for s in results if results[s]]
    if not seg_list:
        return {}
    if len(seg_list) >= (1 << 16):
        # key packing carries 16 bits of label index; huge id spaces take
        # the per-label path
        return None
    seg_index = {s: i for i, s in enumerate(seg_list)}

    vparts, rparts, sparts, pparts = [], [], [], []
    pid = 0
    for s in seg_list:
        mn = np.asarray(offsets_by_segid[s], dtype=np.int64)
        for verts, rads in results[s]:
            if len(verts) == 0:
                continue
            v = np.asarray(verts, dtype=np.int64) + mn
            vparts.append(v)
            rparts.append(np.asarray(rads, dtype=np.float32))
            sparts.append(np.full(len(v), seg_index[s], dtype=np.int64))
            pparts.append(np.full(len(v), pid, dtype=np.int64))
            pid += 1
    if not vparts:
        return {}

    V = np.concatenate(vparts)          # (T, 3) global voxel coords
    R = np.concatenate(rparts)          # (T,)
    S = np.concatenate(sparts)          # (T,) label index
    P = np.concatenate(pparts)          # (T,) path id

    # from_path: fuse consecutive duplicates within a path (keep the raw
    # arrays too — reference radii are last-write-wins over the RAW
    # stream, including occurrences the fusion drops)
    V_raw, R_raw, S_raw = V, R, S
    keep = np.ones(len(V), dtype=bool)
    keep[1:] = (P[1:] != P[:-1]) | np.any(V[1:] != V[:-1], axis=1)
    V, R, S, P = V[keep], R[keep], S[keep], P[keep]
    T = len(V)

    def pack(Sa, Va):
        # vertex dedup key per (label, voxel): coords < 2^16 per axis and
        # label index < 2^16 by construction of seg_list chunking upstream
        return ((Sa.astype(np.uint64) << 48)
                | (Va[:, 0].astype(np.uint64) << 32)
                | (Va[:, 1].astype(np.uint64) << 16)
                | Va[:, 2].astype(np.uint64))

    key = pack(S, V)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    is_new = np.ones(T, dtype=bool)
    is_new[1:] = ks[1:] != ks[:-1]
    gid_sorted = np.cumsum(is_new) - 1
    n_groups = int(gid_sorted[-1]) + 1
    gid = np.empty(T, dtype=np.int64)
    gid[order] = gid_sorted

    # group -> representative (first occurrence in fused order)
    rep = np.full(n_groups, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(rep, gid, np.arange(T, dtype=np.int64))

    # last-write radii over the RAW stream (every raw key exists in the
    # fused set, so the searchsorted is an exact match)
    uniq_keys = ks[is_new]
    raw_gid = np.searchsorted(uniq_keys, pack(S_raw, V_raw))
    last_raw = np.zeros(n_groups, dtype=np.int64)
    np.maximum.at(last_raw, raw_gid, np.arange(len(V_raw), dtype=np.int64))

    g_verts = V[rep]
    g_radii = R_raw[last_raw]
    g_seg = S[rep]

    # edges: consecutive path vertices, undirected, deduped
    same_path = P[1:] == P[:-1]
    e0 = gid[:-1][same_path]
    e1 = gid[1:][same_path]
    lo = np.minimum(e0, e1)
    hi = np.maximum(e0, e1)
    ekey = lo.astype(np.uint64) * np.uint64(n_groups) + hi.astype(np.uint64)
    ekey = np.unique(ekey)
    lo = (ekey // np.uint64(n_groups)).astype(np.int64)
    hi = (ekey % np.uint64(n_groups)).astype(np.int64)

    # disconnected-vertex removal + final per-group local ids. Groups are
    # already ordered by (label, x, y, z) — consolidate's output order.
    used = np.zeros(n_groups, dtype=bool)
    used[lo] = True
    used[hi] = True
    final_id = np.cumsum(used) - 1
    # per-label base offset of the local numbering
    kept_seg = g_seg[used]
    kept_verts = g_verts[used].astype(np.float32)
    kept_radii = g_radii[used]
    n_kept = len(kept_seg)
    seg_starts = np.searchsorted(kept_seg, np.arange(len(seg_list)))
    seg_ends = np.searchsorted(kept_seg, np.arange(len(seg_list)),
                               side="right")

    local = final_id - seg_starts[g_seg]
    elo = local[lo].astype(np.uint32)
    ehi = local[hi].astype(np.uint32)
    eseg = g_seg[lo]
    eorder = np.argsort(eseg, kind="stable")
    elo, ehi, eseg = elo[eorder], ehi[eorder], eseg[eorder]
    es_starts = np.searchsorted(eseg, np.arange(len(seg_list)))
    es_ends = np.searchsorted(eseg, np.arange(len(seg_list)), side="right")

    anisotropy = np.asarray(anisotropy, dtype=np.float32)
    transform = np.array(
        [[anisotropy[0], 0, 0, 0],
         [0, anisotropy[1], 0, 0],
         [0, 0, anisotropy[2], 0]], dtype=np.float32)

    out = {}
    for s, i in seg_index.items():
        v0, v1 = int(seg_starts[i]), int(seg_ends[i])
        if v1 <= v0:
            continue
        e0_, e1_ = int(es_starts[i]), int(es_ends[i])
        skel = Skeleton(
            kept_verts[v0:v1],
            np.stack([elo[e0_:e1_], ehi[e0_:e1_]], axis=1),
            kept_radii[v0:v1],
            segid=s,
        )
        skel.transform = transform.copy()
        out[s] = skel
    return out
