"""Global trace engine: every label's TEASAR trace in full-volume passes.

The batched crop engine (kimimaro_tpu.engine) vmaps the whole per-label
trace over bucketed crops. At dense label counts that schedule decomposes
into ~70 small launches whose power-of-two crops cover ~8x the volume, and
each launch pays its own batch-max path straggling — measured 81% of wall
time on the reference's headline workload (512^3, 2124 labels;
/root/reference/benchmarks/benchmark.py:10-35).

This engine exploits that connected components PARTITION the foreground:

  * every geodesic field of the TEASAR pipeline (root probe, DAF, PDRF
    rail distance, rolling-ball invalidation — reference
    kimimaro/trace.py:121-168,225-263) is computed for ALL labels at once
    as ONE cc-masked relaxation over the full volume (ops.gsweep), with
    full (H, W) planes per Pallas grid step;
  * per-label argmax/target selection gathers fixed-shape crops around
    each label's bbox (vmapped dynamic_slice) — flat-index argmax order
    inside any containing crop equals global (x,y,z)-lex order, so
    tie-breaks match the crop engine exactly;
  * all labels chase their paths simultaneously (vmapped pointer walks on
    the shared rail field, window-masked by cc);
  * the path loop advances in lock-step host iterations: iteration k runs
    path k of every still-active label, so total relaxation work is
    max-paths-over-labels rounds over one volume instead of
    sum-over-buckets of batch-max rounds over 8x-padded crops.

Labels the global pass cannot hold (bbox exceeding the gather crop, soma
candidates — their hole-fill/re-EDT branch is per-label by nature
(reference trace.py:104-119) — manual-target overflow, voxel_graph
volumes) fall through to the crop engine untouched.

Exactness: gsweep's masked relaxations are bit-identical to the crop
engine's per-label fields (tests/test_gsweep.py); every consumer here
(argmax, chase, invalidation) masks by cc id, so results match
engine.trace_batched up to shared floating-point ties
(tests/test_gengine.py pins equality on tie-free fixtures).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import gsweep
from .ops import pallas_argmax
from .ops.fused_trace import RELAX_ROUNDS
from .utils import progcache

INF = np.float32(np.inf)
NEG_INF = np.float32(-np.inf)

T_CAP = 16     # manual-target slots per label (same cap as the crop engine)
K_ITER = 24    # lock-step path iterations (p90 over the dense workload: 5)
EXTRA_ROUND_STAGES = 3  # warm +rounds continuations before giving up

# Fixed gather-crop menu (per-axis extents, clamped to the volume). Every
# compile shape in this engine derives from (volume shape, this menu,
# power-of-two lane buckets) — NEVER from the workload's bbox percentiles:
# a new bbox distribution used to mean minutes of fresh XLA compiles at
# 512^3 (the r3 bench died recompiling for the second workload). Labels
# land in the smallest tier whose crop holds their bbox; larger bboxes
# ride the crop engine. The 48/96/192 intermediate tiers cut the gather
# traffic of the per-label argmaxes ~2x on the dense workload (its bbox
# population sat just past the 64 boundary, paying 128^3 per label).
# The 384 tier keeps winding neurites lock-step: on the neurite 512^3
# workload every label fits 384 but ~2% exceed 256 — without it each
# oversize tube becomes a near-unique crop-engine bucket (measured
# together with non-selective bail: >150 fresh batched_trace_kernel
# compiles, ~750 s of XLA, and slow single-lane re-traces even warm).
G_CROP_MENU = (16, 32, 48, 64, 96, 128, 192, 256, 384)


def _pow2_at_least(n: int) -> int:
    b = 16
    while b < n:
        b <<= 1
    return b


def _tier_crops(vol_shape) -> List[Tuple[int, int, int]]:
    """The gather-crop tiers for this volume: menu entries clamped
    per-axis, deduplicated (small volumes collapse to fewer tiers)."""
    crops: List[Tuple[int, int, int]] = []
    for m in G_CROP_MENU:
        c = tuple(int(min(m, int(s))) for s in vol_shape)
        if not crops or c != crops[-1]:
            crops.append(c)
    return crops


def _lane_bucket(n: int) -> int:
    """Lane counts quantize to powers of two (min 4) so group shapes are
    shared across workloads with similar label populations; empty tiers
    keep a 4-lane stub so the group STRUCTURE never changes."""
    if n <= 4:
        return 4
    return 1 << (n - 1).bit_length()


# --------------------------------------------------------------------------- #
# device helpers


def _crop_argmax(packed, cc16, offs, lids, crop: Tuple[int, int, int],
                 chunk: Optional[int] = None):
    """Per-label argmax of a globally packed f32 field over the label's
    voxels inside its gather crop. Returns (flat_idx_in_crop (N,), value
    (N,)). Lane-chunked scan bounds the materialized crops: the chunk
    adapts to the crop so the live slices stay under ~0.75 GB (big crops
    from winding neurite bboxes OOM'd the fixed 128-lane chunk)."""
    if chunk is None:
        crop_bytes = 6 * int(np.prod(crop))  # f32 slice + u16 slice
        chunk = int(min(128, max(4, (768 << 20) // max(crop_bytes, 1))))

    def one(off, lid):
        c = jax.lax.dynamic_slice(packed, (off[0], off[1], off[2]), crop)
        l = jax.lax.dynamic_slice(cc16, (off[0], off[1], off[2]), crop)
        v = jnp.where(l == lid, c, -INF).ravel()
        idx = jnp.argmax(v)
        return idx, v[idx]

    n = offs.shape[0]
    ch = min(chunk, n)
    pad = (-n) % ch
    offs_p = jnp.pad(offs, ((0, pad), (0, 0)))
    lids_p = jnp.pad(lids.astype(jnp.uint16), (0, pad))

    def body(_, x):
        o, l = x
        return None, jax.vmap(one)(o, l)

    _, (idx, val) = jax.lax.scan(
        body, None,
        (offs_p.reshape(-1, ch, 3), lids_p.reshape(-1, ch)),
    )
    return idx.reshape(-1)[:n], val.reshape(-1)[:n]


def _unflatten_crop(idx, offs, crop):
    """Crop-flat argmax index -> global (x, y, z) coords."""
    cy = crop[1] * crop[2]
    x = idx // cy
    r = idx - x * cy
    y = r // crop[2]
    z = r - y * crop[2]
    return offs + jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


def _use_pallas_argmax() -> bool:
    """Pallas streamed argmax on real TPU backends (each crop voxel read
    once vs the XLA gather form's materialize+reduce, ~4x on the dense
    workload's 2048-lane 96^3 tier); env override for A/B measurement.
    Resolved at trace time; progcache keys include the env + backend."""
    env = os.environ.get("KIMIMARO_TPU_PALLAS_ARGMAX", "auto")
    if env in ("0", "off"):
        return False
    if env in ("1", "on"):
        return True
    return pallas_argmax.available()


def _grouped_argmax(packed, cc16, offs, lids, groups):
    """Per-label argmax with per-GROUP gather crops: labels are pre-sorted
    so each static (start, stop, crop) group slices its own rows. One
    oversized shared crop made every label pay the biggest label's gather
    cost (8-16x waste on long-bbox neurite workloads); the fixed-menu
    tiers bound it. Returns (coords (N, 3) global, values (N,))."""
    use_pallas = _use_pallas_argmax()
    coords, vals = [], []
    for (a, b, crop) in groups:
        if use_pallas:
            c, val = pallas_argmax.crop_argmax(
                packed, cc16, offs[a:b], lids[a:b], crop)
            coords.append(c)
        else:
            idx, val = _crop_argmax(packed, cc16, offs[a:b], lids[a:b],
                                    crop)
            coords.append(_unflatten_crop(idx, offs[a:b], crop))
        vals.append(val)
    if len(coords) == 1:
        return coords[0], vals[0]
    return jnp.concatenate(coords, axis=0), jnp.concatenate(vals, axis=0)


def _shift3(a, off, fill):
    """out[v] = a[v + off] with `fill` beyond the volume (static off)."""
    pads = []
    slcs = []
    for d, n in zip(off, a.shape):
        pads.append((max(-d, 0), max(d, 0)))
        slcs.append(slice(max(d, 0), max(d, 0) + n))
    return jnp.pad(a, pads, constant_values=fill)[tuple(slcs)]


def _descent_code(d_rail, cc):
    """Per-voxel descent byte: (first-min neighbor index k in [0,27) << 1)
    | (d_rail <= 0). Replicates _chase_global's tie-break exactly (argmin
    over the 27-window in lexicographic offset order, center +inf,
    cross-label neighbors +inf). One fused stencil pass per iteration
    turns every chase step from two 27-voxel window gathers per lane into
    a single byte gather."""
    best = jnp.full(d_rail.shape, INF, dtype=jnp.float32)
    bestk = jnp.zeros(d_rail.shape, dtype=jnp.uint8)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    k += 1
                    continue
                nv = _shift3(d_rail, (dx, dy, dz), INF)
                ncc = _shift3(cc, (dx, dy, dz), jnp.int32(-1))
                v = jnp.where(ncc == cc, nv, INF)
                take = v < best
                best = jnp.where(take, v, best)
                bestk = jnp.where(take, jnp.uint8(k), bestk)
                k += 1
    return (bestk << jnp.uint8(1)) | (d_rail <= 0.0).astype(jnp.uint8)


def _chase_codes(code_flat, starts, L: int, vol_shape):
    """All labels chase their paths at once on the descent-code volume:
    per step each lane gathers ONE byte and advances by the decoded
    offset. Same contract as _chase_global: (flat_path (N, L) int32 with
    -1 padding, plen (N,), reached (N,))."""
    sy = vol_shape[1] * vol_shape[2]
    sz = vol_shape[2]
    deltas = np.zeros((27,), dtype=np.int32)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                deltas[k] = dx * sy + dy * sz + dz
                k += 1
    deltas_d = jnp.asarray(deltas)
    size = int(np.prod(vol_shape))

    starts_flat = (starts[:, 0].astype(jnp.int32) * sy
                   + starts[:, 1].astype(jnp.int32) * sz
                   + starts[:, 2].astype(jnp.int32))

    def one(start):
        def cond(state):
            i, cur, path, done = state
            return (~done) & (i < L)

        def body(state):
            i, cur, path, done = state
            path = path.at[i].set(cur)
            c = code_flat[cur]
            at_rail = (c & 1) == 1
            nxt = jnp.clip(cur + deltas_d[(c >> 1).astype(jnp.int32)],
                           0, size - 1)
            cur = jnp.where(at_rail, cur, nxt)
            return i + 1, cur, path, done | at_rail

        path0 = jnp.full((L,), -1, dtype=jnp.int32)
        i, cur, path, done = jax.lax.while_loop(
            cond, body, (jnp.int32(0), start, path0, jnp.bool_(False)))
        return path, i, done

    return jax.vmap(one)(starts_flat)


def _chase_global(d_pad, cc_pad, starts, lids, L: int, vol_shape):
    """All labels chase the shared rail field at once: per lane a 26-
    neighbor descent to the nearest rail (d <= 0), window-masked to the
    lane's label. Mirrors ops.fused_trace._chase (first-minimum tie break
    in lexicographic offset order). Returns (flat_path (N, L) int32 with
    -1 padding, plen (N,), reached (N,))."""
    sy = vol_shape[1] * vol_shape[2]
    sz = vol_shape[2]

    def one(start, lid):
        def cond(state):
            i, cur, path, done = state
            return (~done) & (i < L)

        def body(state):
            i, cur, path, done = state
            flat = (cur[0] * sy + cur[1] * sz + cur[2]).astype(jnp.int32)
            path = path.at[i].set(flat)
            dcur = d_pad[cur[0] + 1, cur[1] + 1, cur[2] + 1]
            at_rail = dcur <= 0.0
            win = jax.lax.dynamic_slice(
                d_pad, (cur[0], cur[1], cur[2]), (3, 3, 3)).reshape(27)
            wcc = jax.lax.dynamic_slice(
                cc_pad, (cur[0], cur[1], cur[2]), (3, 3, 3)).reshape(27)
            win = jnp.where(wcc == lid, win, INF)
            win = win.at[13].set(INF)
            k = jnp.argmin(win)
            off = jnp.stack([k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1])
            nxt = cur + off.astype(jnp.int32)
            cur = jnp.where(at_rail, cur, nxt)
            return i + 1, cur, path, done | at_rail

        path0 = jnp.full((L,), -1, dtype=jnp.int32)
        i, cur, path, done = jax.lax.while_loop(
            cond, body, (jnp.int32(0), start.astype(jnp.int32), path0,
                         jnp.bool_(False)))
        return path, i, done

    return jax.vmap(one)(starts, lids)


# --------------------------------------------------------------------------- #
# jitted phases (volumes always passed as args: closure-captured arrays
# embed into the HLO and trip the remote compiler's request limits)


@functools.partial(jax.jit, static_argnames=("groups",))
def _nc_reduce(mask, cc16, offs, lids, groups):
    """Per-label any() of a voxel change mask: cc partitions the
    foreground, so the label owning a changed voxel is the only label that
    change can affect. Called only on the (rare) unconverged dispatches."""
    packed = jnp.where(mask, 1.0, -INF).astype(jnp.float32)
    _, val = _grouped_argmax(packed, cc16, offs, lids, groups)
    return val > 0.0


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds"))
def _probe_phase(cc_x, cc_y, cc_z, firstvox, live, anisotropy, rounds):
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    d0 = jnp.full(cc_x.shape, INF, dtype=jnp.float32)
    # scatter-min with +inf on dead (padding) lanes: a plain set() would
    # plant a spurious zero source at (0,0,0) inside a real label
    src = jnp.where(live, 0.0, INF).astype(jnp.float32)
    d0 = d0.at[firstvox[:, 0], firstvox[:, 1], firstvox[:, 2]].min(src)
    d, mask = gsweep.relax_full(d0, cc_v, None, None, anisotropy, rounds,
                                mode="euclid", return_mask=True)
    return d, mask, jnp.sum(mask, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds", "mode"))
def _relax_cont(d, cc_x, cc_y, cc_z, nodecost, anisotropy, rounds, mode):
    """Warm continuation: more rounds on an existing field (escalation
    without re-running from scratch). `nodecost` is None except for
    mode="node" (the rail field's PDRF)."""
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    nc_v = None if nodecost is None else gsweep.MaskViews(nodecost)
    d, mask = gsweep.relax_full(d, cc_v, nc_v, None, anisotropy, rounds,
                                mode=mode, return_mask=True)
    return d, mask, jnp.sum(mask, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("groups", "anisotropy",
                                              "rounds"))
def _root_daf_phase(probe, cc_x, cc_y, cc_z, cc16, offs, lids,
                    roots_in, has_root, live, groups, anisotropy, rounds):
    """auto roots from the probe field, then the DAF relaxation
    (reference trace.py:121-148)."""
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    packed = jnp.where(jnp.isfinite(probe), probe, -INF)
    auto_root, _ = _grouped_argmax(packed, cc16, offs, lids, groups)
    roots = jnp.where(has_root[:, None], roots_in, auto_root)

    d0 = jnp.full(probe.shape, INF, dtype=jnp.float32)
    src = jnp.where(live, 0.0, INF).astype(jnp.float32)
    d0 = d0.at[roots[:, 0], roots[:, 1], roots[:, 2]].min(src)
    daf, mask = gsweep.relax_full(d0, cc_v, None, None, anisotropy, rounds,
                                  mode="euclid", return_mask=True)
    return roots, daf, mask, jnp.sum(mask, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds",
                                              "dual"))
def _broadcast_phase(daf, dbf, cc_x, cc_y, cc_z, anisotropy, rounds,
                     dual=False):
    """Per-label scalar broadcasts as maxflood sweeps: per-voxel label-max
    of dbf^1.01 (the PDRF M term, reference trace.py:329-336) and of DAF
    (the normalization term). A 134M-element table gather costs ~1.19s on
    the v5e (measured; TPU gathers are scalar-unit work), so the old
    m_table[cc] / inv_maxdaf[cc] broadcasts dominated this phase; two
    maxflood relaxes are bandwidth-bound sweeps instead (one fused
    two-field relax when `dual` — per-field results bit-identical).
    Computing dbf_max^1.01 on device also matches the crop engine's
    in-kernel M bit-for-bit (engine._one_label)."""
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    fg = cc_x > 0
    daf = jnp.where(jnp.isfinite(daf), daf, 0.0)
    dbfp = jnp.where(fg, jnp.power(dbf, np.float32(1.01)), NEG_INF)
    d0 = jnp.where(fg, daf, NEG_INF)
    if dual:
        (m_fl, d_fl), (mask_m, mask_d) = gsweep.relax_full_dual(
            dbfp, d0, cc_v, None, None, anisotropy, rounds, kind="max2")
    else:
        m_fl, mask_m = gsweep.relax_full(dbfp, cc_v, None, None, anisotropy,
                                         rounds, mode="maxflood",
                                         return_mask=True)
        d_fl, mask_d = gsweep.relax_full(d0, cc_v, None, None, anisotropy,
                                         rounds, mode="maxflood",
                                         return_mask=True)
    return (daf, m_fl, mask_m, jnp.sum(mask_m, dtype=jnp.int32),
            d_fl, mask_d, jnp.sum(mask_d, dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds",
                                              "pdrf_exponent"))
def _pdrf_rail_phase(daf, dbf, m_fl, d_fl, cc_x, cc_y, cc_z,
                     roots, live, pdrf_scale, anisotropy, rounds,
                     pdrf_exponent):
    """PDRF from the DBF + DAF (reference trace.py:315-356, exact crop
    engine formula engine._one_label) and the initial rail field. m_fl /
    d_fl are the _broadcast_phase maxflood volumes (per-voxel label-max
    of dbf^1.01 and DAF)."""
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    fg = cc_x > 0

    m_vol = jnp.where(fg, 1.0 / jnp.maximum(m_fl, 1e-30), 0.0)
    imd_vol = jnp.where(d_fl > 0, 1.0 / jnp.maximum(d_fl, 1e-30), 0.0)

    dbf_inf = jnp.where(dbf == 0, INF, dbf)
    p = 1.0 - dbf_inf * m_vol
    e = int(pdrf_exponent)
    if e > 0 and (e & (e - 1)) == 0:
        while e > 1:
            p = p * p
            e >>= 1
    else:
        p = jnp.power(p, e)
    pdrf = p * pdrf_scale + daf * imd_vol
    pdrf = jnp.where(fg, pdrf, INF).astype(jnp.float32)
    # PDRF is non-negative, so a scatter-min with 0 on live lanes (inf on
    # dead padding lanes) equals the reference's root-zeroing exactly
    src = jnp.where(live, 0.0, INF).astype(jnp.float32)
    pdrf = pdrf.at[roots[:, 0], roots[:, 1], roots[:, 2]].min(src)

    d0 = jnp.full(dbf.shape, INF, dtype=jnp.float32)
    d0 = d0.at[roots[:, 0], roots[:, 1], roots[:, 2]].min(src)
    nc_v = gsweep.MaskViews(pdrf)
    d_rail, mask = gsweep.relax_full(d0, cc_v, nc_v, None, anisotropy,
                                     rounds, mode="node", return_mask=True)
    return pdrf, d_rail, mask, jnp.sum(mask, dtype=jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("groups", "anisotropy", "r_ball", "r_warm",
                     "fix_branching", "L", "dual"),
    donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7),
)
def _iteration(valid, pdrf, d_rail, nb, na, done, path_buf, len_buf,
               it, it_w,
               daf, dbf, cc_x, cc_y, cc_z, cc16,
               offs, lids, roots,
               before_stack, after_stack, max_paths_arr,
               scale, const,
               groups, anisotropy, r_ball, r_warm, fix_branching, L,
               dual=False):
    """One lock-step path iteration for every still-active label:
    target -> chase -> rolling-ball invalidation -> rail rezero + warm
    re-relax (reference trace.py:225-263; exact semantics from
    engine._one_label's loop body).

    `it` is the GLOBAL path index (max_paths accounting); `it_w` is the
    segment-local write row in path_buf/len_buf (the host drains and
    reuses the K_ITER-row buffers when a label outlives one segment).
    The ball and rail relaxes escalate ON DEVICE (cond-gated extra
    rounds) so winding components converge without a host round-trip and
    the loop stays pipelined; the returned change masks cover only the
    residue past the escalation budget (tainted by the host)."""
    vol_shape = daf.shape
    cc_v = gsweep.MaskViews.from_views(cc_x, cc_y, cc_z)
    N = lids.shape[0]

    # --- target selection
    packed = jnp.where(valid != 0, daf, -INF)
    auto_t, am_val = _grouped_argmax(packed, cc16, offs, lids, groups)
    has_valid = am_val > -INF

    use_before = nb > 0
    use_after = (~use_before) & (~has_valid) & (na > 0)
    bt = before_stack[jnp.arange(N), jnp.maximum(nb - 1, 0)]
    at = after_stack[jnp.arange(N), jnp.maximum(na - 1, 0)]
    target = jnp.where(use_before[:, None], bt,
                       jnp.where(use_after[:, None], at, auto_t))

    work = has_valid | (nb > 0) | (na > 0)
    active = work & (~done) & (it < max_paths_arr)
    nb = jnp.where(active & use_before, nb - 1, nb)
    na = jnp.where(active & use_after, na - 1, na)

    # inactive lanes chase from their root: at-rail on step 0, zero cost
    start = jnp.where(active[:, None], target, roots)

    # --- chase on the shared rail field (descent-code volume: one byte
    # gather per step per lane instead of two 27-voxel window gathers)
    code = _descent_code(d_rail, cc_x)
    path_flat, plen, reached = _chase_codes(
        code.ravel(), start, L, vol_shape)
    overflow = active & (~reached)
    plen = jnp.where(active, plen, 0)

    pmask = (jnp.arange(L)[None, :] < plen[:, None]) & active[:, None]
    pf = jnp.where(pmask, path_flat, 0)

    # --- rolling-ball invalidation (reference trace.py:253-259)
    radii = scale * dbf.ravel()[pf] + const
    ball0 = jnp.full(vol_shape, INF, dtype=jnp.float32).ravel()
    ball0 = ball0.at[pf].min(jnp.where(pmask, -radii, INF))
    ball0 = ball0.reshape(vol_shape)
    ok = valid.ravel().at[pf].max(pmask.astype(valid.dtype)).reshape(vol_shape)
    ok_v = gsweep.MaskViews(ok)
    if fix_branching and dual:
        # fused ball+rail relax: the path rezeroes run first (they do not
        # depend on the ball), then ONE dual-field escalated relax covers
        # both — per-field results bit-identical to the separate calls
        zero = jnp.where(pmask, 0.0, INF)
        pdrf = pdrf.ravel().at[pf].min(zero).reshape(vol_shape)
        d_rail = d_rail.ravel().at[pf].min(zero).reshape(vol_shape)
        nc_v = gsweep.MaskViews(pdrf)
        (ball_d, d_rail), (ball_mask, rail_mask) = gsweep.relax_escalated_dual(
            ball0, d_rail, cc_v, nc_v, ok_v, anisotropy, r_ball,
            kind="ball_rail", extra_stages=EXTRA_ROUND_STAGES,
            extra_rounds=4)
        n_chg_rail = jnp.sum(rail_mask, dtype=jnp.int32)
        ball = ball_d <= 0.0
        valid = jnp.where(ball, 0, valid).astype(valid.dtype)
    else:
        ball_d, ball_mask = gsweep.relax_escalated(
            ball0, cc_v, None, ok_v, anisotropy, r_ball, mode="euclid",
            clamp_positive=True, conv="negative",
            extra_stages=EXTRA_ROUND_STAGES, extra_rounds=4)
        ball = ball_d <= 0.0
        valid = jnp.where(ball, 0, valid).astype(valid.dtype)

        # --- new rails (reference trace.py:261-263)
        if fix_branching:
            zero = jnp.where(pmask, 0.0, INF)
            pdrf = pdrf.ravel().at[pf].min(zero).reshape(vol_shape)
            d_rail = d_rail.ravel().at[pf].min(zero).reshape(vol_shape)
            nc_v = gsweep.MaskViews(pdrf)
            d_rail, rail_mask = gsweep.relax_escalated(
                d_rail, cc_v, nc_v, None, anisotropy, r_warm, mode="node",
                extra_stages=EXTRA_ROUND_STAGES, extra_rounds=4)
            n_chg_rail = jnp.sum(rail_mask, dtype=jnp.int32)
        else:
            rail_mask = jnp.zeros(vol_shape, dtype=bool)
            n_chg_rail = jnp.int32(0)

    # --- bookkeeping
    path_buf = jax.lax.dynamic_update_slice(
        path_buf, path_flat[None].astype(jnp.int32), (it_w, 0, 0))
    len_buf = jax.lax.dynamic_update_slice(
        len_buf,
        jnp.stack([plen.astype(jnp.int16),
                   active.astype(jnp.int16),
                   overflow.astype(jnp.int16)], axis=-1)[None],
        (it_w, 0, 0))
    done = done | (~work) | overflow
    stats = jnp.stack([jnp.sum(active, dtype=jnp.int32),
                       jnp.sum(ball_mask, dtype=jnp.int32),
                       n_chg_rail])
    return (valid, pdrf, d_rail, nb, na, done, path_buf, len_buf,
            stats, ball_mask, rail_mask)


@jax.jit
def _drain(path_buf, dbf, gather_idx):
    flat = path_buf.reshape(-1)[gather_idx]
    radii = dbf.ravel()[flat]
    return flat, radii


# --------------------------------------------------------------------------- #
# host driver


def trace_global(
    cc_dev,
    dbf_dev,
    jobs: List[dict],
    teasar_params: dict,
    anisotropy: Sequence[float],
    fix_branching: bool,
    firstvox_arr: Optional[np.ndarray] = None,
    progress: bool = False,
) -> Tuple[Dict[int, List[Tuple[np.ndarray, np.ndarray]]], List[dict]]:
    """Run eligible labels through the global engine.

    Same contract as engine.trace_batched: returns ({segid: [(verts,
    radii), ...]}, leftover_jobs). Path vertices come back in the job's
    bbox frame, rail-first, exactly like the crop engine. Leftover jobs
    (ineligible or failed labels) must be run through engine.trace_batched
    by the caller.
    """
    p = dict(teasar_params)
    scale = float(p.get("scale", 10))
    const = float(p.get("const", 10))
    pdrf_scale = float(p.get("pdrf_scale", 5000))
    pdrf_exponent = int(p.get("pdrf_exponent", 16))
    sdt = float(p.get("soma_detection_threshold", 1100))
    sat = float(p.get("soma_acceptance_threshold", 4000))
    max_paths = p.get("max_paths", None)
    anis = tuple(float(a) for a in anisotropy)
    soma_cut = min(sdt, sat)

    vol_shape = tuple(int(s) for s in cc_dev.shape)

    # the global pass carries compact cc ids as uint16 (cc16/_crop_argmax);
    # id spaces beyond that ride the crop engine unchanged
    if jobs and max(int(j["segid"]) for j in jobs) >= (1 << 16):
        return {}, list(jobs)

    # --- eligibility split
    eligible: List[dict] = []
    leftover: List[dict] = []
    n_soma = n_tcap = n_blocked = 0
    for job in jobs:
        dmx = job.get("dbfmax")
        soma_possible = (dmx is None) or (float(dmx) > soma_cut)
        n_b, n_a = len(job["before"]), len(job["after"])
        blocked = (max_paths is not None) and (n_b + n_a) >= int(max_paths)
        if soma_possible or n_b > T_CAP or n_a > T_CAP or blocked:
            leftover.append(job)
            n_soma += int(soma_possible)
            n_tcap += int(n_b > T_CAP or n_a > T_CAP)
            n_blocked += int(blocked)
        else:
            eligible.append(job)
    from .utils import profiling as _prof
    _prof.count("gengine_skip_soma", n_soma)
    _prof.count("gengine_skip_tcap", n_tcap)
    _prof.count("gengine_skip_maxpaths", n_blocked)

    tiers = _tier_crops(vol_shape)
    crop_max = tiers[-1]
    fits = [j for j in eligible
            if all(int(s) <= c for s, c in zip(j["shape"], crop_max))]
    refit = [j for j in eligible
             if not all(int(s) <= c for s, c in zip(j["shape"], crop_max))]
    leftover.extend(refit)
    _prof.count("gengine_skip_refit", len(refit))
    eligible = fits

    if len(eligible) < 2:
        # the global fixed cost only pays for itself across many labels
        return {}, leftover + eligible

    # Tiered gather crops from the fixed menu: each label lands in the
    # smallest tier whose crop holds its bbox (tier choice cannot change
    # results — flat-index argmax order inside ANY containing crop equals
    # global (x,y,z)-lex order). Each tier's lane count pads to a power
    # of two; empty tiers keep a 4-lane stub. Group structure therefore
    # depends only on (volume shape, lane buckets) — one compiled program
    # set serves dense, neurite, and real workloads.
    by_tier: List[List[dict]] = [[] for _ in tiers]
    for j in eligible:
        for t, c in enumerate(tiers):
            if all(int(s) <= cc for s, cc in zip(j["shape"], c)):
                by_tier[t].append(j)
                break

    groups_l = []
    lane_jobs: List[Optional[dict]] = []
    for t, c in enumerate(tiers):
        b = _lane_bucket(len(by_tier[t]))
        start = len(lane_jobs)
        lane_jobs.extend(by_tier[t])
        lane_jobs.extend([None] * (b - len(by_tier[t])))
        groups_l.append((start, start + b, c))
    groups = tuple(groups_l)
    eligible = lane_jobs  # lane-indexed; None rows are padding

    N = len(lane_jobs)
    n_live = sum(1 for j in lane_jobs if j is not None)
    live = np.array([j is not None for j in lane_jobs])
    L = max(2 * sum(crop_max), 64)
    r_main = RELAX_ROUNDS
    r_ball = int(os.environ.get("KIMIMARO_TPU_GENGINE_RBALL",
                                str(max(3, r_main // 2))))
    # 3 = the old effective depth (rounds+1 contract); at 2 the dense
    # 512^3 rail leaves ~52k voxels unconverged at it=0 and every
    # iteration pays a repair continuation instead
    r_warm = int(os.environ.get("KIMIMARO_TPU_GENGINE_RWARM",
                                str(max(3, (r_main + 2) // 3))))
    # fused two-field relaxes (ball+rail per iteration, the two setup
    # maxfloods): same math, half the sweep launches and one cc read per
    # plane step. Requires equal ball/warm depths (the fused rounds are
    # shared); env 0 restores the separate relaxes for A/B measurement.
    dual_env = os.environ.get("KIMIMARO_TPU_GENGINE_DUAL", "auto")
    dual_on = (dual_env not in ("0", "off")
               and bool(fix_branching) and r_ball == r_warm)

    # --- host-side job arrays (global frame)
    lids = np.zeros(N, dtype=np.int32)
    offs = np.zeros((N, 3), dtype=np.int32)
    roots_in = np.zeros((N, 3), dtype=np.int32)
    has_root = np.zeros(N, dtype=bool)
    before_stack = np.zeros((N, T_CAP, 3), dtype=np.int32)
    nb0 = np.zeros(N, dtype=np.int32)
    after_stack = np.zeros((N, T_CAP, 3), dtype=np.int32)
    na0 = np.zeros(N, dtype=np.int32)
    # unlimited by default (reference trace.py max_paths=None); the real
    # bound is max_segs whole buffer segments (capacity taint past that)
    max_paths_arr = np.full(N, 1 << 30, dtype=np.int32)
    job_off = np.zeros((N, 3), dtype=np.int64)

    crop_of = np.empty((N, 3), dtype=np.int64)
    for (a, b, c) in groups:
        crop_of[a:b] = np.asarray(c)
    for i, job in enumerate(eligible):
        if job is None:
            continue
        lids[i] = job["segid"]
        mn = np.asarray(job["offset"], dtype=np.int64)
        job_off[i] = mn
        off = np.minimum(mn, np.asarray(vol_shape) - crop_of[i])
        offs[i] = np.maximum(off, 0)
        for t_i, t in enumerate(job["before"]):
            before_stack[i, t_i] = np.asarray(t, dtype=np.int64) + mn
        nb0[i] = len(job["before"])
        for t_i, t in enumerate(job["after"]):
            after_stack[i, t_i] = np.asarray(t, dtype=np.int64) + mn
        na0[i] = len(job["after"])
        if job.get("root") is not None:
            roots_in[i] = np.asarray(job["root"], dtype=np.int64) + mn
            has_root[i] = True
        if max_paths is not None:
            max_paths_arr[i] = int(max_paths)

    # first foreground voxel per label (lexicographic min = the crop
    # engine's argmax(fg.ravel()) in any containing crop); dead padding
    # lanes point at (0,0,0) but scatter +inf (see _probe_phase)
    if firstvox_arr is not None:
        firstvox = np.where(live[:, None], firstvox_arr[lids], 0)
    else:
        n_cap = _pow2_at_least(int(np.max(lids)) + 1)
        flat_first = np.asarray(jax.device_get(_first_voxels(cc_dev,
                                                             n_cap)))
        firstvox = np.stack(np.unravel_index(
            np.minimum(flat_first[lids], np.prod(vol_shape) - 1), vol_shape),
            axis=-1)
        firstvox = np.where(live[:, None], firstvox, 0)
    firstvox = firstvox.astype(np.int32)

    # --- device arrays
    cc_x = cc_dev.astype(jnp.int32)
    cc_y = jnp.transpose(cc_x, gsweep._PERM_TO_Y)
    cc_z = jnp.transpose(cc_y, gsweep._PERM_Y_TO_Z)
    cc16 = cc_x.astype(jnp.uint16)
    dbf = dbf_dev.astype(jnp.float32)

    lids_d = jnp.asarray(lids)
    offs_d = jnp.asarray(offs)
    live_d = jnp.asarray(live)

    import time as _time

    from .utils import profiling

    _t_setup = _time.perf_counter()
    setup_taint = np.zeros(N, dtype=bool)
    debug = os.environ.get("KIMIMARO_TPU_GENGINE_DEBUG", "0") != "0"
    if debug:
        print(f"[gengine] N={N} live={n_live} groups={groups} L={L}",
              flush=True)

    def _continue_until(field, mask, n_chg, mode="euclid", nodecost=None,
                        phase=""):
        """Escalate an unconverged setup relax with warm continuations;
        labels still changing afterwards are tainted individually (cc
        masking means an unconverged label corrupts only itself)."""
        stages = 0
        if debug:
            print(f"[gengine] setup {phase}: n_chg={int(n_chg)}", flush=True)
        while int(n_chg) > 0 and stages < EXTRA_ROUND_STAGES:
            field, mask, n_chg = progcache.call(
                "gengine_relax_cont", _relax_cont,
                dict(anisotropy=anis, rounds=4, mode=mode),
                field, cc_x, cc_y, cc_z, nodecost)
            stages += 1
            if debug:
                print(f"[gengine] setup {phase} stage {stages}: "
                      f"n_chg={int(n_chg)}", flush=True)
        if int(n_chg) > 0:
            bits = np.asarray(jax.device_get(progcache.call(
                "gengine_nc_reduce", _nc_reduce, dict(groups=groups),
                mask, cc16, offs_d, lids_d)))
            setup_taint[:] |= bits
            if debug:
                print(f"[gengine] setup {phase}: tainted {int(bits.sum())}",
                      flush=True)
        return field

    # --- setup fields
    probe, mask, n_chg = progcache.call(
        "gengine_probe", _probe_phase,
        dict(anisotropy=anis, rounds=r_main),
        cc_x, cc_y, cc_z, jnp.asarray(firstvox), live_d)
    probe = _continue_until(probe, mask, n_chg, phase="probe")

    roots, daf, mask, n_chg = progcache.call(
        "gengine_root_daf", _root_daf_phase,
        dict(groups=groups, anisotropy=anis, rounds=r_main),
        probe, cc_x, cc_y, cc_z, cc16, offs_d, lids_d,
        jnp.asarray(roots_in), jnp.asarray(has_root), live_d)
    daf = _continue_until(daf, mask, n_chg, phase="daf")
    del probe

    (daf, m_fl, mask_m, n_chg_m, d_fl, mask_d, n_chg_d) = progcache.call(
        "gengine_broadcast", _broadcast_phase,
        dict(anisotropy=anis, rounds=r_main,
             dual=dual_env not in ("0", "off")),
        daf, dbf, cc_x, cc_y, cc_z)
    m_fl = _continue_until(m_fl, mask_m, n_chg_m, mode="maxflood",
                           phase="m_broadcast")
    d_fl = _continue_until(d_fl, mask_d, n_chg_d, mode="maxflood",
                           phase="daf_broadcast")

    pdrf, d_rail, mask, n_chg = progcache.call(
        "gengine_pdrf_rail", _pdrf_rail_phase,
        dict(anisotropy=anis, rounds=r_main,
             pdrf_exponent=pdrf_exponent),
        daf, dbf, m_fl, d_fl, cc_x, cc_y, cc_z,
        roots, live_d, jnp.float32(pdrf_scale))
    del m_fl, d_fl
    d_rail = _continue_until(d_rail, mask, n_chg, mode="node",
                             nodecost=pdrf, phase="rail")

    profiling.count("gengine_setup_ms",
                    int(1000 * (_time.perf_counter() - _t_setup)))
    _t_loop = _time.perf_counter()

    # --- lock-step path loop (segmented buffers + convergence repair)
    valid = (cc_x > 0).astype(jnp.uint8)
    nb = jnp.asarray(nb0)
    na = jnp.asarray(na0)
    # tainted labels and dead padding lanes skip the loop
    done = jnp.asarray(setup_taint | ~live)
    path_buf = jnp.full((K_ITER, N, L), -1, dtype=jnp.int32)
    len_buf = jnp.zeros((K_ITER, N, 3), dtype=jnp.int16)

    before_d = jnp.asarray(before_stack)
    after_d = jnp.asarray(after_stack)
    mp_d = jnp.asarray(max_paths_arr)
    roots_h = roots  # device (N, 3)

    # bail: hand labels still active after an iteration to the crop
    # engine instead of more lock-step rounds. A lock-step iteration
    # costs ~0.85 s at 512^3 regardless of how few labels remain (the
    # sweeps cover the full volume), so once the active count is small
    # the crop engine's bucketed re-trace is cheaper: measured on the
    # dense benchmark, bail 100 saved 5.6 s of tail iterations for 3.1 s
    # of crop work (24.4 s -> 21.6 s). Small workloads keep bail off —
    # their whole loop is shorter than one crop-engine launch.
    #
    # Bail is SELECTIVE by crop size: only labels whose gather crop fits
    # BAIL_CROP voxels per axis leave — big-bbox labels (winding
    # neurites) stay lock-step, because the crop engine is the wrong
    # venue for them: each becomes a 1-4 lane bucket with a near-unique
    # (crop, L, rounds) static key (measured on the neurite 512^3
    # workload: 45 bailed tubes -> 150+ fresh batched_trace_kernel
    # compiles, ~750 s of XLA), and even warm, a single-lane 256^3+ crop
    # re-trace costs more than the lock-step iterations it saves.
    default_bail = 100 if n_live > 500 else 0
    bail_n = int(os.environ.get("KIMIMARO_TPU_GENGINE_BAIL",
                                str(default_bail)))
    bail_crop = int(os.environ.get("KIMIMARO_TPU_GENGINE_BAIL_CROP", "128"))
    # lanes whose gather crop is small enough to bail cheaply
    bail_ok = live & np.all(crop_of <= bail_crop, axis=1)
    # segments: when the K_ITER-row path buffer fills with labels still
    # active, it is drained host-side and REUSED — long-path labels keep
    # their finished paths instead of re-tracing in the crop engine
    # (VERDICT r3 item 8); capacity taint now needs max_segs*K_ITER paths
    max_segs = int(os.environ.get("KIMIMARO_TPU_GENGINE_SEGS", "16"))

    taint_nc = np.zeros(N, dtype=bool)
    taint_bail = np.zeros(N, dtype=bool)
    bailed = False
    purged = False
    n_act = -1
    seg = 0
    seg_rows = 0

    # host accumulators across segments: per-lane ordered path rows
    per_lane: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
    t_overflow = np.zeros(N, dtype=bool)
    last_actives = np.zeros((K_ITER, N), dtype=bool)

    from .engine import _paths_structurally_valid

    def _drain_segment(pbuf, lbuf):
        """Fetch a segment's finished paths into per_lane. Tainted lanes
        are dropped at final assembly, not here — a taint found in a
        LATER segment must still discard the lane's earlier rows."""
        lens = np.asarray(jax.device_get(lbuf))  # (K_ITER, N, 3) i16
        plens = lens[:, :, 0].astype(np.int64)
        actives = lens[:, :, 1].astype(bool)
        t_overflow[:] |= lens[:, :, 2].astype(bool).any(axis=0) & live
        keep = actives & (plens > 0)
        keep[:, ~live] = False
        idx_list = []
        meta = []  # (lane, length)
        for r in range(K_ITER):
            for lane in np.nonzero(keep[r])[0]:
                ln = int(plens[r, lane])
                base = (r * N + lane) * L
                idx_list.append(np.arange(base, base + ln, dtype=np.int64))
                meta.append((lane, ln))
        if idx_list:
            gidx = jnp.asarray(np.concatenate(idx_list))
            flat, radii = jax.device_get(_drain(pbuf, dbf, gidx))
            flat = np.asarray(flat)
            radii = np.asarray(radii)
            pos = 0
            for (lane, ln) in meta:
                f = flat[pos: pos + ln]
                rr = radii[pos: pos + ln]
                pos += ln
                verts = np.stack(np.unravel_index(f, vol_shape), axis=-1)
                # device rows run target->rail; reference rail-first order
                verts = verts[::-1] - job_off[lane]
                per_lane.setdefault(lane, []).append(
                    (verts.astype(np.int64), rr[::-1]))
        return actives

    iter_statics = dict(
        groups=groups, anisotropy=anis, r_ball=r_ball, r_warm=r_warm,
        fix_branching=bool(fix_branching), L=L, dual=dual_on)

    def _land(pit, pstats, pbmask, prmask):
        """Fetch a landed iteration's flags; taint labels whose ball/rail
        relax still changed past the ON-DEVICE escalation budget (rare:
        cond-gated extra rounds inside _iteration cover winding
        components). Returns the iteration's active count."""
        n_act, ncb, ncr = (
            int(v) for v in np.asarray(jax.device_get(pstats)))
        if ncb > 0:
            taint_nc[:] |= np.asarray(jax.device_get(progcache.call(
                "gengine_nc_reduce", _nc_reduce, dict(groups=groups),
                pbmask, cc16, offs_d, lids_d)))
        if ncr > 0:
            taint_nc[:] |= np.asarray(jax.device_get(progcache.call(
                "gengine_nc_reduce", _nc_reduce, dict(groups=groups),
                prmask, cc16, offs_d, lids_d)))
        if debug:
            print(f"[gengine] it={pit} n_act={n_act} ncb={ncb} ncr={ncr} "
                  f"taint_nc={int(taint_nc.sum())} "
                  f"t={_time.perf_counter():.1f}", flush=True)
        return n_act

    it = 0
    while True:
        seg_rows = 0
        pending = []  # (global_it, stats, ball_mask, rail_mask)
        for it_w in range(K_ITER):
            (valid, pdrf, d_rail, nb, na, done, path_buf, len_buf,
             stats, ball_mask, rail_mask) = progcache.call(
                "gengine_iteration", _iteration, iter_statics,
                valid, pdrf, d_rail, nb, na, done, path_buf, len_buf,
                jnp.int32(it), jnp.int32(it_w),
                daf, dbf, cc_x, cc_y, cc_z, cc16,
                offs_d, lids_d, roots_h,
                before_d, after_d, mp_d,
                jnp.float32(scale), jnp.float32(const),
                donates=True)
            it += 1
            seg_rows = it_w + 1
            pending.append((it - 1, stats, ball_mask, rail_mask))
            # stay one iteration ahead of the flag fetch: land it-1 while
            # iteration `it` runs on device
            if len(pending) >= 2:
                n_act = _land(*pending.pop(0))
                if n_act == 0:
                    break
                if bail_n and not purged and n_act <= bail_n and it >= 3:
                    # selective bail: small-crop actives leave for the
                    # crop engine (tainted below). Big-crop actives keep
                    # iterating lock-step only when their combined crop
                    # volume justifies full-volume iterations — a handful
                    # of big labels re-trace faster in the crop engine
                    # (dense: 3 bigs cost 4 extra 0.85 s iterations vs
                    # ~0.2 s of warm crop work), while a big POPULATION
                    # must stay (neurite: 20 winding tubes cost ~28 s +
                    # a fresh-compile cascade in the crop engine vs 8
                    # extra lock-step iterations)
                    done_h = np.asarray(jax.device_get(done))
                    act = live & ~done_h
                    smalls = act & bail_ok
                    bigs = act & ~bail_ok
                    big_vol = float(
                        np.prod(crop_of[bigs], axis=1).sum()) if bigs.any() \
                        else 0.0
                    keep_frac = float(os.environ.get(
                        "KIMIMARO_TPU_GENGINE_KEEP_FRAC", "0.25"))
                    if big_vol < keep_frac * float(np.prod(vol_shape)):
                        bailed = True
                        break
                    purged = True
                    if smalls.any():
                        taint_bail |= smalls
                        done = done | jnp.asarray(smalls)
                    if debug:
                        print(f"[gengine] bail purge: {int(smalls.sum())} "
                              f"small -> crop engine, {int(bigs.sum())} "
                              f"big stay lock-step "
                              f"(crop vol {big_vol / np.prod(vol_shape):.2f}"
                              f"x volume)", flush=True)
        for p in pending:
            last = _land(*p)
            if n_act != 0 and not bailed:
                n_act = last
        del pending, ball_mask, rail_mask
        last_actives = _drain_segment(path_buf, len_buf)
        if n_act == 0 or bailed:
            break
        seg += 1
        if seg >= max_segs:
            break
        path_buf = jnp.full((K_ITER, N, L), -1, dtype=jnp.int32)
        len_buf = jnp.zeros((K_ITER, N, 3), dtype=jnp.int16)

    profiling.count("gengine_loop_ms",
                    int(1000 * (_time.perf_counter() - _t_loop)))
    profiling.count("gengine_segments", seg + 1)
    _t_drain = _time.perf_counter()

    # taint causes, tracked separately (VERDICT r3 item 8: the re-trace
    # tax was a single opaque counter)
    t_setup = setup_taint & live
    t_nonconv = taint_nc & live
    t_over = t_overflow & live
    t_capacity = taint_bail & live
    if n_act > 0:
        # still active when the loop stopped (bail or max_segs exhausted)
        t_capacity |= last_actives[max(seg_rows, 1) - 1] & live
    tainted = t_setup | t_nonconv | t_over | t_capacity
    if debug:
        print(f"[gengine] drain: N={N} it={it} segs={seg + 1} "
              f"bailed={bailed} purged={purged} "
              f"setup_taint={int(setup_taint.sum())} "
              f"taint_nc={int(taint_nc.sum())} "
              f"overflow={int(t_over.sum())} "
              f"capacity={int(t_capacity.sum())} "
              f"tainted={int(tainted.sum())}", flush=True)

    # --- final assembly
    results: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
    t_struct = np.zeros(N, dtype=bool)
    for lane, paths in per_lane.items():
        if tainted[lane] or eligible[lane] is None:
            continue
        if not _paths_structurally_valid(paths):
            tainted[lane] = True
            t_struct[lane] = True
            continue
        results[int(lids[lane])] = paths
    profiling.count("gengine_taint_structural", int(t_struct.sum()))
    if debug and t_struct.any():
        print(f"[gengine] structural fails: {int(t_struct.sum())}; "
              f"final tainted={int(tainted.sum())}", flush=True)

    for n_i in np.nonzero(tainted)[0]:
        if eligible[n_i] is None:
            continue
        results.pop(int(lids[n_i]), None)
        leftover.append(eligible[n_i])

    n_tainted = int((tainted & live).sum())
    profiling.count("gengine_drain_ms",
                    int(1000 * (_time.perf_counter() - _t_drain)))
    profiling.count("gengine_jobs", n_live - n_tainted)
    profiling.count("gengine_fallback", n_tainted)
    profiling.count("gengine_taint_setup", int(t_setup.sum()))
    profiling.count("gengine_taint_nonconv", int(t_nonconv.sum()))
    profiling.count("gengine_taint_overflow", int(t_over.sum()))
    profiling.count("gengine_taint_capacity", int(t_capacity.sum()))

    return results, leftover


@functools.partial(jax.jit, static_argnames=("n_cap",))
def _first_voxels(cc_dev, n_cap: int):
    """Per-label minimum flat index (the lexicographically-first voxel)."""
    flat = cc_dev.ravel().astype(jnp.int32)
    n = flat.shape[0]
    lin = jnp.arange(n, dtype=jnp.int32)
    return jnp.full((n_cap,), n, dtype=jnp.int32).at[flat].min(lin)
