"""26-connected multi-label connected components labeling on device.

TPU-native replacement for the `cc3d` C++ dependency
(/root/reference/kimimaro/utility.py:58-83, intake.py:162). Voxels belong to
the same component iff they share the same nonzero label and are
26-connected within it.

Design: label propagation + pointer jumping ("FastSV"-style). Each voxel
starts as its own 1-based linear index; every round takes the minimum index
over same-label 26-neighbors (a static stencil of shifted mins) and then
performs two pointer-jump hops (a flat gather). Convergence is
O(log(component diameter)) rounds — dense vector work that maps directly
onto the VPU, versus the sequential union-find scan the CPU reference uses.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stencils import graph_allows, neighborhood_offsets, shifted

OFFSETS26 = neighborhood_offsets(26)


_BIGID = np.int32(2**31 - 1)
INF_F32 = np.float32(np.inf)


def _plane_offsets_ccl(axis, direction):
    return [o for o in OFFSETS26 if o[axis] == -direction]


@functools.partial(jax.jit, static_argnames=("has_vg", "phase", "rounds"))
def _ccl_stage(ids0, labels, voxel_graph, has_vg: bool = False,
               phase: int = 1, rounds: int = 6):
    """Min-id propagation by directional plane sweeps (the same schedule as
    the SSSP engine): a sweep along +x carries ids across the whole volume
    along any x-monotone same-label path in one pass, so rounds scale with
    the number of direction reversals of components, not their diameter.
    Pointer jumps (phase 2) collapse id chains. No per-voxel gathers in
    the sweeps — this is the TPU-friendly form of label-propagation CCL.

    STATIC trip counts + a host-checked convergence flag (data-dependent
    while fixpoints miscompile on TPU; see ops.geodesic._relax_stage).
    phase 1: `rounds` pure sweep rounds. phase 2: `rounds` x (two sweep
    rounds + pointer jump) for long winding components. Returns
    (ids, converged).

    voxel_graph (has_vg=True): cc3d-convention bitfield masking adjacency —
    the color_connectivity_graph analogue for self-touching labels."""
    fg = labels != 0

    def sweep(ids, axis, direction):
        m = ids.shape[axis]
        if m <= 1:
            return ids
        offs = _plane_offsets_ccl(axis, direction)
        plane_shifts = [
            (tuple(o[a] for a in range(3) if a != axis),
             tuple(-c for c in o))
            for o in offs
        ]

        ii = jnp.moveaxis(ids, axis, 0)
        ll = jnp.moveaxis(labels, axis, 0)
        vg = jnp.moveaxis(voxel_graph, axis, 0) if has_vg else None
        if direction < 0:
            ii, ll = ii[::-1], ll[::-1]
            vg = vg[::-1] if has_vg else None

        def step(carry, x):
            prev_i, prev_l = carry
            cur_i, cur_l = x[0], x[1]
            vgp = x[2] if has_vg else None
            best = cur_i
            for po, neg_o in plane_shifts:
                nb_i = shifted(prev_i, po, _BIGID)
                nb_l = shifted(prev_l, po, 0)
                ok = (nb_l == cur_l) & (nb_i < best)
                if has_vg:
                    ok = ok & shifted(graph_allows(vgp, neg_o), po, False)
                best = jnp.where(ok, nb_i, best)
            return (best, cur_l), best

        xs = (ii[1:], ll[1:], vg[:-1]) if has_vg else (ii[1:], ll[1:])
        (_, _), rest = jax.lax.scan(step, (ii[0], ll[0]), xs)
        out = jnp.concatenate([ii[:1], rest], axis=0)
        if direction < 0:
            out = out[::-1]
        return jnp.moveaxis(out, 0, axis)

    def jump(ids):
        flat = jnp.where(ids == _BIGID, 0, ids).ravel()
        hop = flat[jnp.maximum(flat - 1, 0)]
        hop = jnp.where(flat > 0, hop, _BIGID).reshape(ids.shape)
        return jnp.minimum(ids, hop)

    def sweep_round(ids):
        for axis in range(3):
            for direction in (1, -1):
                ids = sweep(ids, axis, direction)
        return ids

    if phase == 1:
        step = sweep_round
    else:
        def step(ids):
            return jump(sweep_round(sweep_round(ids)))

    def body(carry, _):
        ids, _ = carry
        nids = step(ids)
        return (nids, jnp.any(nids != ids)), None

    (ids, changed), _ = jax.lax.scan(
        body, (ids0, jnp.bool_(True)), None, length=int(rounds) + 1
    )
    return ids, ~changed


@functools.partial(jax.jit, static_argnames=("phase", "rounds"))
def _ccl_stage_gsweep(ids0, labels_i32, phase: int = 1, rounds: int = 5):
    """_ccl_stage on the gsweep full-plane engine: a 512^3 sweep is ONE
    Pallas launch instead of 512 sequential scan steps (the scan form's
    ~21k tiny dispatches made CCL a 4-10 s phase on the dense benchmark).
    Same min-id semantics; labels (bitcast int32) are the propagation
    mask. No voxel_graph support — graph callers keep the scan stage."""
    from . import gsweep

    cc_v = gsweep.MaskViews(labels_i32)
    anis = (1.0, 1.0, 1.0)

    def jump(ids):
        flat = jnp.where(ids == _BIGID, 0, ids).ravel()
        hop = flat[jnp.maximum(flat - 1, 0)]
        hop = jnp.where(flat > 0, hop, _BIGID).reshape(ids.shape)
        return jnp.minimum(ids, hop)

    if phase == 1:
        def step(ids):
            return gsweep.one_round(ids, cc_v, None, None, anis, "minid",
                                    False)
    else:
        def step(ids):
            ids = gsweep.one_round(ids, cc_v, None, None, anis, "minid",
                                   False)
            ids = gsweep.one_round(ids, cc_v, None, None, anis, "minid",
                                   False)
            return jump(ids)

    def body(carry, _):
        ids, _ = carry
        nids = step(ids)
        return (nids, jnp.any(nids != ids)), None

    (ids, changed), _ = jax.lax.scan(
        body, (ids0, jnp.bool_(True)), None, length=int(rounds) + 1
    )
    return ids, ~changed


def connected_components(labels, voxel_graph=None) -> jnp.ndarray:
    """Raw 26-connected multi-label CCL. Returns an int32 volume where each
    component is labeled by the (1-based) minimum linear index of its voxels;
    background is 0. Use `compact_cc` to renumber to 1..N.

    voxel_graph: optional cc3d-convention connectivity bitfield (self-touch
    walls; the color_connectivity_graph analogue)."""
    labels = jnp.asarray(labels)
    assert labels.ndim == 3
    vg = (
        jnp.zeros((1, 1, 1), dtype=jnp.uint32)
        if voxel_graph is None
        else jnp.asarray(voxel_graph).astype(jnp.uint32)
    )
    has_vg = voxel_graph is not None
    fg = labels != 0
    n = labels.size
    lin = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(labels.shape)
    ids = jnp.where(fg, lin, _BIGID)

    # ≤32-bit labels bitcast losslessly to the int32 mask the Pallas minid
    # kernels take; voxel_graph and 64-bit labels keep the scan stage
    use_gsweep = (not has_vg) and labels.dtype.itemsize <= 4
    if use_gsweep:
        if labels.dtype == jnp.uint32:
            labels_i32 = jax.lax.bitcast_convert_type(labels, jnp.int32)
        else:
            labels_i32 = labels.astype(jnp.int32)

    # phase 1: pure sweep rounds — no gathers at all. Most volumes
    # converge here (rounds = number of direction reversals of components).
    if use_gsweep:
        ids, conv = _ccl_stage_gsweep(ids, labels_i32, phase=1, rounds=5)
    else:
        ids, conv = _ccl_stage(ids, labels, vg, has_vg=has_vg, phase=1,
                               rounds=5)
    # phase 2 (escalating): long winding components still unconverged —
    # accelerate with pointer jumping (a full-volume random gather, the
    # slowest primitive on TPU, so it only runs when sweeps alone stall).
    # ONE fixed stage size: warm restarts repeat the same compiled program
    # (each new 512^3 program variant costs minutes of XLA compile; extra
    # launches of a cached one cost milliseconds).
    # KIMIMARO_TPU_CCL_PHASE2=sweep runs jump-free escalation stages
    # instead — on winding-tube volumes the jumps (random 134M-element
    # gathers) can dominate the phase; both forms converge exactly.
    import os as _os

    p2 = _os.environ.get("KIMIMARO_TPU_CCL_PHASE2", "jump")
    phase2 = 1 if p2 == "sweep" else 2
    rounds2 = 8 if p2 == "sweep" else 4
    while not bool(conv):
        if use_gsweep:
            ids, conv = _ccl_stage_gsweep(ids, labels_i32, phase=phase2,
                                          rounds=rounds2)
        else:
            ids, conv = _ccl_stage(ids, labels, vg, has_vg=has_vg,
                                   phase=phase2, rounds=rounds2)
    return jnp.where(fg, ids, 0)


@jax.jit
def _rep_prefix(cc_raw):
    flat = cc_raw.ravel()
    lin = jnp.arange(1, flat.size + 1, dtype=flat.dtype)
    repmask = flat == lin  # background (0) never matches
    return jnp.cumsum(repmask.astype(jnp.int32))


@jax.jit
def _compact_flood_init(cc_raw):
    """Scan-order rank seeded at each component's root voxel (where the
    raw id equals 1 + the voxel's own linear index), BIGID elsewhere."""
    n = cc_raw.size
    lin = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(cc_raw.shape)
    is_root = cc_raw == lin
    rank = jnp.cumsum(is_root.ravel().astype(jnp.int32)).reshape(
        cc_raw.shape)
    return jnp.where(is_root, rank, _BIGID)


@functools.partial(jax.jit, static_argnames=("rounds",))
def _compact_flood_relax(d, cc_raw, rounds: int):
    from . import gsweep

    cc_v = gsweep.MaskViews(cc_raw)
    d, mask = gsweep.relax_full(d, cc_v, None, None, (1.0, 1.0, 1.0),
                                rounds, mode="minid", return_mask=True)
    return d, jnp.sum(mask, dtype=jnp.int32)


@jax.jit
def _compact_jump(cc_raw):
    """Exact fallback: every voxel reads its root's rank directly (the
    raw id IS the root's 1-based linear index). One 134M-element gather
    (~1.2s on v5e) — only taken when the flood fails to converge (deeply
    wound components)."""
    n = cc_raw.size
    lin = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(cc_raw.shape)
    is_root = cc_raw == lin
    rank = jnp.cumsum(is_root.ravel().astype(jnp.int32))
    idx = jnp.clip(cc_raw.ravel() - 1, 0, n - 1)
    return rank[idx].reshape(cc_raw.shape)


def _is_multidevice(x) -> bool:
    try:
        return len(x.sharding.device_set) > 1
    except AttributeError:
        return False


@functools.partial(jax.jit, static_argnames=("n_max",))
def _compact_compare(cc_raw, prefix, n_max: int):
    """Broadcast-compare ranking (sum of roots <= v): n_max x volume
    compares, but purely elementwise — the form GSPMD partitions cleanly
    over a mesh-sharded volume (the flood's transposed plane scans would
    force cross-shard gathers there)."""
    n = cc_raw.size
    flat = cc_raw.ravel()
    n_comp = prefix[-1]
    ids = jnp.arange(1, n_max + 1, dtype=jnp.int32)
    rep_lin = jnp.clip(jnp.searchsorted(prefix, ids), 0, n - 1)
    roots = jnp.where(
        ids <= n_comp, (rep_lin + 1).astype(jnp.int32),
        jnp.int32(n + 2) + ids,  # keep the table sorted past the end
    )
    flat32 = flat.astype(jnp.int32)
    CH = min(128, n_max)

    def body(acc, chunk):
        return acc + jnp.sum(
            flat32[:, None] >= chunk[None, :], axis=1, dtype=jnp.int32
        ), None

    rank, _ = jax.lax.scan(
        body,
        jnp.zeros(flat32.shape, dtype=jnp.int32),
        roots.reshape(n_max // CH, CH),
    )
    cc = jnp.where(flat > 0, rank, 0)
    return cc.reshape(cc_raw.shape)


def _compact_from_roots(cc_raw, prefix, n_max: int, rounds: int = 5):
    """Compact ids by FLOODING each component's scan-order rank from its
    root over the component (minid sweeps), escalating on host. Replaces
    the old broadcast-compare ranking (n_max x volume compares = 550 Gop
    at 512^3 / 4096 labels, ~2s of async VPU time that drained into the
    next pipeline phase) with bandwidth-bound sweeps whose round count
    mirrors the CCL flood that just converged on the same geometry.
    Mesh-sharded inputs keep the compare form (GSPMD-partitionable)."""
    if _is_multidevice(cc_raw):
        return _compact_compare(cc_raw, prefix, n_max)
    d = _compact_flood_init(cc_raw)
    d, n_chg = _compact_flood_relax(d, cc_raw, rounds)
    if int(n_chg) > 0:
        d, n_chg = _compact_flood_relax(d, cc_raw, 4)
    if int(n_chg) > 0:
        d = _compact_jump(cc_raw)
    return jnp.where(cc_raw > 0, d, 0)


def compact_cc(cc_raw):
    """Device-side compaction of raw CCL output to contiguous 1..N in
    first-appearance (scan) order — the fastremap.renumber convention — with
    zero full-volume host transfers.

    The raw id of a component equals 1 + the minimum linear index of its
    voxels, so representatives are exactly the voxels where id == lin+1.
    Each voxel's compact id (its root's scan-order rank) is min-flooded
    from the roots by bandwidth-bound sweeps, with an exact one-gather
    fallback for components the flood cannot reach in the round budget.

    Returns (cc int32 compact, n_components int, rep_prefix (flat int32)).
    """
    prefix = _rep_prefix(cc_raw)
    n_components = int(prefix[-1])  # one scalar fetch
    if n_components == 0:
        return (
            jnp.zeros(cc_raw.shape, dtype=jnp.int32),
            0,
            prefix,
        )
    n_max = 1 << max(int(np.ceil(np.log2(max(n_components, 2)))), 1)
    cc = _compact_from_roots(cc_raw, prefix, n_max)
    return cc, n_components, prefix


def _range_reduce(levels, lo, hi, sentinel, op):
    """Vectorized [lo, hi) range reduction over a min/max pyramid.

    levels[k][i] reduces elements [i*2^k, (i+1)*2^k) of the base array;
    the classic bottom-up segment-tree walk consumes odd endpoints at each
    level, so each query costs 2 tiny gathers per level."""
    res = jnp.full(lo.shape, sentinel, levels[0].dtype)
    l, r = lo, hi
    for arr in levels:
        m = arr.shape[0]
        oddl = (l & 1) == 1
        usel = oddl & (l < r)
        res = op(res, jnp.where(usel, arr[jnp.clip(l, 0, m - 1)], sentinel))
        l = l + oddl.astype(l.dtype)
        oddr = (r & 1) == 1
        user = oddr & (l < r)
        res = op(res, jnp.where(user, arr[jnp.clip(r - 1, 0, m - 1)],
                                sentinel))
        r = r - oddr.astype(r.dtype)
        l = l >> 1
        r = r >> 1
    return res


def _pyramids(mn0, mx0):
    """Paired min/max pyramids over a base level (lists, coarsest last)."""
    mn_levels, mx_levels = [mn0], [mx0]
    while mn_levels[-1].shape[0] > 1:
        a, b = mn_levels[-1], mx_levels[-1]
        if a.shape[0] % 2:
            a = jnp.concatenate([a, jnp.full((1,), _BIGID, a.dtype)])
            b = jnp.concatenate([b, jnp.full((1,), -1, b.dtype)])
        mn_levels.append(jnp.minimum(a[0::2], a[1::2]))
        mx_levels.append(jnp.maximum(b[0::2], b[1::2]))
    return mn_levels, mx_levels


_RUN_BLOCK = 256


def runs_bbox(flat, shape, ids, values=None):
    """Counts + per-id bounding boxes of a flattened id volume, from ONE
    key-value sort (ids keyed, linear index carried).

    Within an id's sorted run the linear indices ascend, so the run
    endpoints give the x extremes directly; y/z extremes come from
    block-reduced min/max pyramids over the run (the blocks keep the
    pyramid tiny — no full-resolution level is ever materialized beyond
    the sorted index array itself) plus ragged-edge gathers of up to one
    block per side. Replaces the previous three full-volume sorts.

    flat: (n,) int32 nonnegative ids; shape: the 3D volume shape;
    ids: (q,) int32 query ids; values: optional (n,) f32 carried through
    the same sort for a per-id max (e.g. the per-label DBF max the trace
    engine gates soma handling on — riding the sort replaces a full-volume
    scatter-max pass). Returns (counts, mn (q,3), mx (q,3) inclusive,
    present[, vmax (q,) when values given]) — mn/mx are int32 max / -1
    for absent ids.
    """
    n = flat.shape[0]
    nx, ny, nz = (int(s) for s in shape)
    stride0 = ny * nz
    lin = jnp.arange(n, dtype=jnp.int32)
    if values is None:
        sorted_ids, sorted_lin = jax.lax.sort((flat, lin), num_keys=1)
        sorted_val = None
    else:
        sorted_ids, sorted_lin, sorted_val = jax.lax.sort(
            (flat, lin, values.astype(jnp.float32)), num_keys=1)

    lo = jnp.searchsorted(sorted_ids, ids)
    hi = jnp.searchsorted(sorted_ids, ids + 1)
    present = hi > lo
    counts = hi - lo

    lin_lo = sorted_lin[jnp.clip(lo, 0, n - 1)]
    lin_hi = sorted_lin[jnp.clip(hi - 1, 0, n - 1)]
    x_mn, x_mx = lin_lo // stride0, lin_hi // stride0

    # block tables: XLA fuses the y/z arithmetic into the reductions, so
    # no full-resolution y/z array hits HBM
    B = _RUN_BLOCK
    npad = (-n) % B
    slin = (jnp.concatenate([sorted_lin, jnp.zeros((npad,), jnp.int32)])
            if npad else sorted_lin)
    blocks = slin.reshape(-1, B)
    by = (blocks // nz) % ny
    bz = blocks % nz
    pyr = {
        "y": _pyramids(by.min(axis=1), by.max(axis=1)),
        "z": _pyramids(bz.min(axis=1), bz.max(axis=1)),
    }
    if sorted_val is not None:
        sval = (jnp.concatenate(
            [sorted_val, jnp.full((npad,), -INF_F32, jnp.float32)])
            if npad else sorted_val)
        vblocks = sval.reshape(-1, B)
        vmax_levels = [vblocks.max(axis=1)]
        while vmax_levels[-1].shape[0] > 1:
            a = vmax_levels[-1]
            if a.shape[0] % 2:
                a = jnp.concatenate(
                    [a, jnp.full((1,), -INF_F32, jnp.float32)])
            vmax_levels.append(jnp.maximum(a[0::2], a[1::2]))
    # the padded tail block is never an interior block of any query
    # (hi <= n ⇒ its topmost interior block index < n // B), so the pad
    # zeros cannot leak into results

    lb = ((lo + B - 1) // B) * B  # first full-block boundary at/after lo
    rb = (hi // B) * B            # last full-block boundary at/before hi
    bl = lb // B
    br = jnp.maximum(rb // B, bl)  # empty interior when the run is short

    off = jnp.arange(B, dtype=jnp.int32)
    outs = {}
    vedge = {}
    for name, (pos0, endcap) in (
        ("L", (lo, jnp.minimum(lb, hi))),
        ("R", (rb, hi)),
    ):
        pos = pos0[:, None] + off[None, :]
        valid = (pos >= lo[:, None]) & (pos < endcap[:, None])
        pos_c = jnp.clip(pos, 0, n - 1)
        v = slin[pos_c]
        vy = (v // nz) % ny
        vz = v % nz
        outs[name] = (
            jnp.min(jnp.where(valid, vy, _BIGID), axis=1),
            jnp.max(jnp.where(valid, vy, -1), axis=1),
            jnp.min(jnp.where(valid, vz, _BIGID), axis=1),
            jnp.max(jnp.where(valid, vz, -1), axis=1),
        )
        if sorted_val is not None:
            vedge[name] = jnp.max(
                jnp.where(valid, sorted_val[pos_c], -INF_F32), axis=1)

    ymn_i = _range_reduce(pyr["y"][0], bl, br, _BIGID, jnp.minimum)
    ymx_i = _range_reduce(pyr["y"][1], bl, br, np.int32(-1), jnp.maximum)
    zmn_i = _range_reduce(pyr["z"][0], bl, br, _BIGID, jnp.minimum)
    zmx_i = _range_reduce(pyr["z"][1], bl, br, np.int32(-1), jnp.maximum)

    y_mn = jnp.minimum(jnp.minimum(outs["L"][0], outs["R"][0]), ymn_i)
    y_mx = jnp.maximum(jnp.maximum(outs["L"][1], outs["R"][1]), ymx_i)
    z_mn = jnp.minimum(jnp.minimum(outs["L"][2], outs["R"][2]), zmn_i)
    z_mx = jnp.maximum(jnp.maximum(outs["L"][3], outs["R"][3]), zmx_i)

    imax = np.iinfo(np.int32).max
    mn = jnp.stack(
        [jnp.where(present, c, imax) for c in (x_mn, y_mn, z_mn)], axis=1
    )
    mx = jnp.stack(
        [jnp.where(present, c, -1) for c in (x_mx, y_mx, z_mx)], axis=1
    )
    if sorted_val is None:
        return counts, mn, mx, present
    vmx_i = _range_reduce(vmax_levels, bl, br, -INF_F32, jnp.maximum)
    vmax = jnp.maximum(jnp.maximum(vedge["L"], vedge["R"]), vmx_i)
    vmax = jnp.where(present, vmax, 0.0)
    return counts, mn, mx, present, vmax


@functools.partial(jax.jit, static_argnames=("n_max",))
def label_info(cc, orig_labels, n_max: int, rep_prefix=None, dbf=None):
    """Per-component metadata on device: voxel counts, bounding boxes, and
    the original label of each component (the get_mapping equivalent,
    reference skeletontricks.pyx:490-525). One small fetch replaces a full
    volume readback.

    Implemented scatter-free via `runs_bbox`: ONE key-value sort of the
    volume (TPU scatters process ~75M updates/s; a single sort replaces
    the three per-axis packed-key sorts this used previously). The
    original-label mapping comes from a searchsorted over the (monotone)
    representative prefix-sum from compact_cc.

    dbf: optional distance field; when given, its per-component max rides
    the same sort (replacing a separate full-volume scatter-max phase) and
    a fifth array is returned.

    Returns (counts (n_max+1,), bbox_min (n_max+1,3), bbox_max (n_max+1,3)
    inclusive, orig (n_max+1,)[, dbfmax (n_max+1,)]).
    """
    shape = cc.shape
    flat = cc.ravel().astype(jnp.int32)
    ids = jnp.arange(n_max + 1, dtype=jnp.int32)
    dbfmax = None
    if dbf is None:
        counts, bbox_min, bbox_max, _present = runs_bbox(flat, shape, ids)
    else:
        counts, bbox_min, bbox_max, _present, dbfmax = runs_bbox(
            flat, shape, ids, values=dbf.ravel())

    # original label per component via its representative voxel (labels
    # must fit uint32; intake falls back to a host mapping for wider)
    if rep_prefix is not None:
        ids = jnp.arange(n_max + 1, dtype=jnp.int32)
        rep_lin = jnp.searchsorted(rep_prefix, ids)
        rep_lin = jnp.clip(rep_lin, 0, rep_prefix.shape[0] - 1)
        orig = orig_labels.ravel()[rep_lin].astype(jnp.uint32)
        orig = orig.at[0].set(0)
    else:
        orig = jnp.zeros((n_max + 1,), dtype=jnp.uint32)
        orig = orig.at[flat].max(orig_labels.ravel().astype(jnp.uint32))
    if dbfmax is None:
        return counts, bbox_min, bbox_max, orig
    return counts, bbox_min, bbox_max, orig, dbfmax


def renumber_cc(
    cc_raw: np.ndarray, orig_labels: np.ndarray
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Host-side compaction of raw CCL output to contiguous 1..N ids, plus
    the cc-id -> original-label mapping (reference
    skeletontricks.get_mapping, utility.py:82)."""
    cc_raw = np.asarray(cc_raw)
    orig_labels = np.asarray(orig_labels)
    uniq, first_idx, inv = np.unique(cc_raw, return_index=True, return_inverse=True)
    # uniq[0] may be 0 (background); map it to 0
    new_ids = np.arange(len(uniq), dtype=np.int64)
    if len(uniq) and uniq[0] == 0:
        pass  # background already maps to 0
    else:
        new_ids = new_ids + 1  # no background present
    cc = new_ids[inv].reshape(cc_raw.shape)

    dtype = np.uint32 if len(uniq) < 2**32 else np.uint64
    cc = cc.astype(dtype)

    remapping: Dict[int, int] = {}
    flat_orig = orig_labels.reshape(-1)
    for uid, fidx in zip(new_ids, first_idx):
        if uid == 0:
            continue
        remapping[int(uid)] = int(flat_orig[fidx])
    return cc, remapping
