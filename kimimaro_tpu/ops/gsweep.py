"""Full-volume label-masked directional sweeps — the global engine's core.

The batched crop engine (kimimaro_tpu.engine) relaxes each label inside its
own padded crop; at dense label counts (the reference's headline 512^3 /
2124-component workload, /root/reference/benchmarks/benchmark.py:10-35) the
power-of-two crop buckets overlap so much that the device sweeps ~8x the
volume's voxels per relaxation, split across ~70 small launches.

Since connected components PARTITION the foreground, every label's geodesic
field can instead be computed in ONE set of sweeps over the full volume:
propagation between voxels is admitted only when their compact cc ids are
equal, which makes each label's field bit-identical to the crop engine's
single-label relaxation (background and other labels read as +inf, exactly
like crop boundaries). One Pallas launch sweeps 512 full (512,512) planes —
~80x fewer sequential grid steps than the bucketed crop schedule.

Sweep semantics match ops.geodesic._sweep: plane i is relaxed from plane
i-1 through the nine (dy, dz) offsets; six directed sweeps make one round;
rounds repeat to a fixpoint that equals the exact Dijkstra distance
(reference dijkstra3d semantics, /root/reference/kimimaro/trace.py:139-158).

Modes:
  euclid:   new = min(cur, min9(prev_same_label + step_cost))
  node:     new = min(cur, min9(prev_same_label) + nodecost[cur])
  maxflood: new = max(cur, max9(prev_same_label))   (per-label max
            broadcast: turns per-label scalars like dbf_max into a volume
            without any 134M-element gather/scatter)
clamp_positive resets positives to +inf (rolling-ball invalidation,
reference dijkstra_invalidation.hpp:239-332); `okmask` additionally
restricts occupancy (valid ∪ ball sources).

Non-axis-0 sweeps run on transposed layouts so every launch streams
lane-aligned (H, W>=128) planes; descending sweeps reverse the grid's
index maps (no data flips).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)
NEG_INF = np.float32(-np.inf)
BIGID = np.int32(2**31 - 1)  # minid mode fill (matches ops.ccl._BIGID)


_FORCE: Optional[str] = None  # "pallas" | "scan" | None (auto): test hook


def _use_pallas() -> bool:
    if _FORCE is not None:
        return _FORCE == "pallas"
    from . import pallas_sweep

    if pallas_sweep.INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _costs9(anis_perm) -> list:
    out = []
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            c = np.float32(np.sqrt(
                anis_perm[0] ** 2
                + (dy * anis_perm[1]) ** 2
                + (dz * anis_perm[2]) ** 2
            ))
            out.append(((dy, dz), c))
    return out


# --------------------------------------------------------------------------- #
# Pallas kernel


def _kernel_factory(costs9, mode: str, clamp_positive: bool, has_ok: bool,
                    H: int, W: int, B: int, descending: bool):
    """Grid walks the swept axis in blocks of B planes; the previously
    relaxed plane and its cc ids ride VMEM scratch with an INF/-1 border
    so the nine neighbor reads are static slices. At grid step 0 the
    scratch border values make the relax a pass-through of plane 0 (the
    scan init carry in the crop engine's sweeps — non-occupied voxels are
    +inf there by invariant). Blocking amortizes the per-grid-step
    sequencing/DMA overhead that dominated 1-plane steps (the sweep's
    compute is a trivially cheap 9-point stencil)."""
    if mode == "maxflood":
        fill = NEG_INF
    elif mode == "minid":
        fill = BIGID
    else:
        fill = INF

    def kernel(*refs):
        if mode == "node":
            if has_ok:
                d_ref, cc_ref, nc_ref, ok_ref, out_ref, prev_ref, pcc_ref = refs
            else:
                d_ref, cc_ref, nc_ref, out_ref, prev_ref, pcc_ref = refs
        else:
            nc_ref = None
            if has_ok:
                d_ref, cc_ref, ok_ref, out_ref, prev_ref, pcc_ref = refs
            else:
                d_ref, cc_ref, out_ref, prev_ref, pcc_ref = refs

        import jax.experimental.pallas as pl

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            vdt = jnp.int32 if mode == "minid" else jnp.float32
            prev_ref[...] = jnp.full((H + 2, W + 2), fill, vdt)
            pcc_ref[...] = jnp.full((H + 2, W + 2), -1, jnp.int32)

        # descending sweeps walk the block's planes high -> low (the
        # block index map already reverses the block order)
        order = range(B - 1, -1, -1) if descending else range(B)
        for b in order:
            cur = d_ref[b]
            ccc = cc_ref[b]
            # minid masks by RAW labels which may bitcast negative; != 0
            # is the occupancy test there (cc ids are strictly positive
            # elsewhere)
            occupied = (ccc != 0) if mode == "minid" else (ccc > 0)
            if has_ok:
                occupied = occupied & (ok_ref[b] != 0)

            cand = jnp.full_like(cur, fill)
            for (dy, dz), c in costs9:
                sv = prev_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
                sc = pcc_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
                sv = jnp.where(sc == ccc, sv, fill)
                if mode == "euclid":
                    sv = sv + c
                if mode == "maxflood":
                    cand = jnp.maximum(cand, sv)
                else:
                    cand = jnp.minimum(cand, sv)
            if mode == "node":
                cand = cand + nc_ref[b]
            if mode == "maxflood":
                new = jnp.where(occupied, jnp.maximum(cur, cand), fill)
            else:
                new = jnp.where(occupied, jnp.minimum(cur, cand), fill)
                if clamp_positive and mode != "minid":
                    new = jnp.where(new > 0.0, INF, new)
            out_ref[b] = new
            prev_ref[1:H + 1, 1:W + 1] = new
            # occupancy folds into the carried cc ids so blocked voxels
            # never propagate (matches crop sweeps where non-ok voxels
            # hold +inf)
            pcc_ref[1:H + 1, 1:W + 1] = jnp.where(occupied, ccc, -1)

    return kernel


def _plane_block(n: int, H: int, W: int, n_operands: int) -> int:
    """Planes per grid step. Measured on the v5e (512^3, 6-round euclid
    relax): B=1 5.95 ms/sweep, B=2 5.93, B=4 6.05, B=8 6.61 — the
    automatic double-buffering already hides the per-step DMA, so
    blocking buys nothing and large blocks add VMEM pressure. Default 1;
    KIMIMARO_TPU_SWEEP_BLOCK overrides for re-measurement on new
    hardware (bounded by a VMEM budget and divisibility)."""
    import os

    want = int(os.environ.get("KIMIMARO_TPU_SWEEP_BLOCK", "1"))
    if want <= 1:
        return 1
    budget = 24 * 1024 * 1024
    for cand in (want, 8, 4, 2):
        if cand >= 2 and n % cand == 0 \
                and cand * H * W * 4 * n_operands <= budget:
            return cand
    return 1


def _sweep0_pallas(d, cc, nodecost, okmask, anis_perm,
                   mode: str, clamp_positive: bool, descending: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import pallas_sweep

    n, H, W = d.shape
    costs9 = _costs9(anis_perm)
    has_ok = okmask is not None
    n_operands = 3 + (mode == "node") + has_ok
    B = _plane_block(n, H, W, n_operands)
    kernel = _kernel_factory(costs9, mode, clamp_positive, has_ok, H, W,
                             B, descending)
    nb = n // B

    if descending:
        def imap(i):
            return (nb - 1 - i, 0, 0)
    else:
        def imap(i):
            return (i, 0, 0)

    spec = pl.BlockSpec((B, H, W), imap)
    ins = [d, cc]
    in_specs = [spec, spec]
    if mode == "node":
        ins.append(nodecost)
        in_specs.append(spec)
    if has_ok:
        ins.append(okmask)
        in_specs.append(spec)

    vdt = jnp.int32 if mode == "minid" else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, H, W), vdt),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2), vdt),
            pltpu.VMEM((H + 2, W + 2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_sweep.INTERPRET,
    )(*ins)


# --------------------------------------------------------------------------- #
# Scan (CPU/reference) form


def _shift2(p, dy, dz, fill):
    from .stencils import shifted

    return shifted(p, (dy, dz), fill)


def _sweep0_scan(d, cc, nodecost, okmask, anis_perm,
                 mode: str, clamp_positive: bool, descending: bool):
    if mode == "maxflood":
        fill = NEG_INF
    elif mode == "minid":
        fill = BIGID
    else:
        fill = INF
    costs9 = _costs9(anis_perm)

    if descending:
        d = d[::-1]
        cc = cc[::-1]
        nodecost = nodecost[::-1] if nodecost is not None else None
        okmask = okmask[::-1] if okmask is not None else None

    occ = (cc != 0) if mode == "minid" else (cc > 0)
    if okmask is not None:
        occ = occ & (okmask != 0)
    cc_eff = jnp.where(occ, cc, -1)

    def step(carry, x):
        prev_v, prev_c = carry
        if mode == "node":
            cur, ccc, occc, ncc = x
        else:
            cur, ccc, occc = x
        cand = jnp.full_like(cur, fill)
        for (dy, dz), c in costs9:
            sv = _shift2(prev_v, dy, dz, fill)
            sc = _shift2(prev_c, dy, dz, -1)
            sv = jnp.where(sc == ccc, sv, fill)
            if mode == "euclid":
                sv = sv + c
            if mode == "maxflood":
                cand = jnp.maximum(cand, sv)
            else:
                cand = jnp.minimum(cand, sv)
        if mode == "node":
            cand = cand + ncc
        if mode == "maxflood":
            new = jnp.where(occc, jnp.maximum(cur, cand), fill)
        else:
            new = jnp.where(occc, jnp.minimum(cur, cand), fill)
            if clamp_positive and mode != "minid":
                new = jnp.where(new > 0.0, INF, new)
        return (new, jnp.where(occc, ccc, -1)), new

    # plane 0 passes through with the same occupancy masking the kernel
    # applies (non-occupied voxels are +inf/-inf by caller invariant)
    if mode == "maxflood":
        first = jnp.where(occ[0], d[0], fill)
    else:
        first = jnp.where(occ[0], d[0], fill)
        if clamp_positive and mode != "minid":
            first = jnp.where(first > 0.0, INF, first)
    xs = (d[1:], cc[1:], occ[1:])
    if mode == "node":
        xs = xs + (nodecost[1:],)
    (_, _), rest = jax.lax.scan(step, (first, jnp.where(occ[0], cc[0], -1)), xs)
    out = jnp.concatenate([first[None], rest], axis=0)
    if descending:
        out = out[::-1]
    return out


def sweep0(d, cc, nodecost, okmask, anis_perm, mode: str,
           clamp_positive: bool, descending: bool):
    """One directed sweep along axis 0 of an (n, H, W) volume."""
    if _use_pallas():
        return _sweep0_pallas(d, cc, nodecost, okmask, anis_perm, mode,
                              clamp_positive, descending)
    return _sweep0_scan(d, cc, nodecost, okmask, anis_perm, mode,
                        clamp_positive, descending)


# --------------------------------------------------------------------------- #
# Round/relax driver

# layout cycle: xyz --x sweeps--> (1,0,2) = yxz --y sweeps-->
#               (2,1,0) of yxz = zxy --z sweeps--> (1,2,0) back to xyz
_PERM_TO_Y = (1, 0, 2)
_PERM_Y_TO_Z = (2, 1, 0)
_PERM_Z_TO_X = (1, 2, 0)


class MaskViews:
    """The three layout views of the static per-relax operands (cc ids and,
    when present, nodecost/okmask). cc views are built once per volume and
    reused across every relaxation of a skeletonize call."""

    __slots__ = ("x", "y", "z")

    def __init__(self, vol, dtype=None):
        v = vol if dtype is None else vol.astype(dtype)
        self.x = v
        self.y = jnp.transpose(v, _PERM_TO_Y)
        self.z = jnp.transpose(self.y, _PERM_Y_TO_Z)

    @classmethod
    def from_views(cls, x, y, z):
        """Wrap pre-transposed views (lets jits take them as plain args
        instead of re-transposing static volumes every call)."""
        self = cls.__new__(cls)
        self.x, self.y, self.z = x, y, z
        return self


def one_round(d, cc_v: MaskViews, nc_v: Optional[MaskViews],
              ok_v: Optional[MaskViews], anisotropy, mode: str,
              clamp_positive: bool):
    """One full round: +-x, +-y, +-z sweeps with layout rotation."""
    ax, ay, az = (float(a) for a in anisotropy)

    def pair(dd, ccv, ncv, okv, anis_perm):
        dd = sweep0(dd, ccv, ncv, okv, anis_perm, mode, clamp_positive, False)
        dd = sweep0(dd, ccv, ncv, okv, anis_perm, mode, clamp_positive, True)
        return dd

    nc = (None, None, None) if nc_v is None else (nc_v.x, nc_v.y, nc_v.z)
    ok = (None, None, None) if ok_v is None else (ok_v.x, ok_v.y, ok_v.z)

    d = pair(d, cc_v.x, nc[0], ok[0], (ax, ay, az))
    d = jnp.transpose(d, _PERM_TO_Y)
    d = pair(d, cc_v.y, nc[1], ok[1], (ay, ax, az))
    d = jnp.transpose(d, _PERM_Y_TO_Z)
    d = pair(d, cc_v.z, nc[2], ok[2], (az, ax, ay))
    return jnp.transpose(d, _PERM_Z_TO_X)


def relax_full(d, cc_v: MaskViews, nc_v, ok_v, anisotropy, rounds: int,
               mode: str = "euclid", clamp_positive: bool = False,
               conv: str = "exact", return_mask: bool = False):
    """`rounds` full rounds with a static trip count; the LAST round
    doubles as the convergence check (a round that changes nothing proves
    the fixpoint, so no separate +1 round is spent — 6 fewer sweeps per
    relax than the old rounds+1 contract). Data-dependent while fixpoints
    miscompile on the tunneled TPU backend, hence the static trip count
    with host-side escalation on an unconverged mask. Returns
    (d, converged), or (d, changed_mask) with the per-voxel last-round
    change mask when `return_mask` — callers reduce it per label (cc
    partitions the foreground, so a change at a voxel taints exactly that
    voxel's label)."""

    def body(dd, _):
        return one_round(dd, cc_v, nc_v, ok_v, anisotropy, mode,
                         clamp_positive), None

    d1, _ = jax.lax.scan(body, d, None, length=max(int(rounds), 1) - 1)
    nd = one_round(d1, cc_v, nc_v, ok_v, anisotropy, mode, clamp_positive)
    if conv == "reach":
        mask = jnp.isfinite(nd) != jnp.isfinite(d1)
    elif conv == "negative":
        mask = (jnp.where(nd <= 0, nd, INF)
                != jnp.where(d1 <= 0, d1, INF))
    else:
        mask = nd != d1
    if return_mask:
        return nd, mask
    return nd, ~jnp.any(mask)


def _dual_kernel_factory(costs9, kind: str, H: int, W: int, B: int,
                         descending: bool):
    """Fused two-field sweep kernels. The gengine's lock-step iteration
    relaxes an invalidation ball (euclid + okmask + clamp_positive) and a
    rail field (node) back to back over the same volume — 36 separate
    Pallas launches per iteration re-reading the shared cc ids each time.
    Its setup likewise runs two independent maxflood broadcasts. Fusing
    each pair halves the launch count and reads cc once per plane step.

    kind="ball_rail": field A = euclid/clamp_positive with okmask, field
    B = node with nodecost. Occupancy folding uses ONE carried cc plane
    (plain cc>0, field B's rule); field A's stricter occupancy (cc>0 & ok)
    is preserved by writing +inf into its carried plane at non-ok voxels,
    which blocks propagation identically (a neighbor that passes the cc
    test but holds +inf contributes nothing to a min).

    kind="max2": two independent maxflood fields, shared occupancy.

    Per-field results are bit-identical to the corresponding single-field
    kernels (tests/test_gsweep.py)."""
    if kind == "max2":
        fill = NEG_INF
    else:
        fill = INF

    def kernel(*refs):
        if kind == "ball_rail":
            (a_ref, b_ref, cc_ref, nc_ref, ok_ref,
             a_out, b_out, pa_ref, pb_ref, pcc_ref) = refs
        else:
            (a_ref, b_ref, cc_ref,
             a_out, b_out, pa_ref, pb_ref, pcc_ref) = refs
            nc_ref = ok_ref = None

        import jax.experimental.pallas as pl

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            pa_ref[...] = jnp.full((H + 2, W + 2), fill, jnp.float32)
            pb_ref[...] = jnp.full((H + 2, W + 2), fill, jnp.float32)
            pcc_ref[...] = jnp.full((H + 2, W + 2), -1, jnp.int32)

        order = range(B - 1, -1, -1) if descending else range(B)
        for b in order:
            cur_a = a_ref[b]
            cur_b = b_ref[b]
            ccc = cc_ref[b]
            occupied = ccc > 0
            if kind == "ball_rail":
                occ_a = occupied & (ok_ref[b] != 0)
            else:
                occ_a = occupied

            cand_a = jnp.full_like(cur_a, fill)
            cand_b = jnp.full_like(cur_b, fill)
            for (dy, dz), c in costs9:
                sc = pcc_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
                same = sc == ccc
                sva = jnp.where(
                    same, pa_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W],
                    fill)
                svb = jnp.where(
                    same, pb_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W],
                    fill)
                if kind == "ball_rail":
                    cand_a = jnp.minimum(cand_a, sva + c)
                    cand_b = jnp.minimum(cand_b, svb)
                else:
                    cand_a = jnp.maximum(cand_a, sva)
                    cand_b = jnp.maximum(cand_b, svb)
            if kind == "ball_rail":
                new_a = jnp.where(occ_a, jnp.minimum(cur_a, cand_a), INF)
                new_a = jnp.where(new_a > 0.0, INF, new_a)  # clamp_positive
                cand_b = cand_b + nc_ref[b]
                new_b = jnp.where(occupied, jnp.minimum(cur_b, cand_b), INF)
            else:
                new_a = jnp.where(occupied, jnp.maximum(cur_a, cand_a), fill)
                new_b = jnp.where(occupied, jnp.maximum(cur_b, cand_b), fill)
            a_out[b] = new_a
            b_out[b] = new_b
            # field A's occupancy difference folds into its carried VALUES
            # (+inf at non-ok voxels blocks propagation); the carried cc
            # plane uses the shared cc>0 rule
            pa_ref[1:H + 1, 1:W + 1] = (
                jnp.where(occ_a, new_a, fill) if kind == "ball_rail"
                else new_a)
            pb_ref[1:H + 1, 1:W + 1] = new_b
            pcc_ref[1:H + 1, 1:W + 1] = jnp.where(occupied, ccc, -1)

    return kernel


def _sweep0_pallas_dual(da, db, cc, nodecost, okmask, anis_perm,
                        kind: str, descending: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import pallas_sweep

    n, H, W = da.shape
    costs9 = _costs9(anis_perm)
    n_operands = 5 + 2 * (kind == "ball_rail")
    B = _plane_block(n, H, W, n_operands)
    kernel = _dual_kernel_factory(costs9, kind, H, W, B, descending)
    nb = n // B

    if descending:
        def imap(i):
            return (nb - 1 - i, 0, 0)
    else:
        def imap(i):
            return (i, 0, 0)

    spec = pl.BlockSpec((B, H, W), imap)
    ins = [da, db, cc]
    if kind == "ball_rail":
        ins.extend([nodecost, okmask])
    in_specs = [spec] * len(ins)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, H, W), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2), jnp.float32),
            pltpu.VMEM((H + 2, W + 2), jnp.float32),
            pltpu.VMEM((H + 2, W + 2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=pallas_sweep.INTERPRET,
    )(*ins)


def one_round_dual(da, db, cc_v: MaskViews, nc_v, ok_v, anisotropy,
                   kind: str):
    """One full +-x/+-y/+-z round of the fused two-field sweep."""
    ax, ay, az = (float(a) for a in anisotropy)

    def pair(aa, bb, ccv, ncv, okv, anis_perm):
        aa, bb = _sweep0_pallas_dual(aa, bb, ccv, ncv, okv, anis_perm,
                                     kind, False)
        aa, bb = _sweep0_pallas_dual(aa, bb, ccv, ncv, okv, anis_perm,
                                     kind, True)
        return aa, bb

    nc = (None, None, None) if nc_v is None else (nc_v.x, nc_v.y, nc_v.z)
    ok = (None, None, None) if ok_v is None else (ok_v.x, ok_v.y, ok_v.z)

    da, db = pair(da, db, cc_v.x, nc[0], ok[0], (ax, ay, az))
    da = jnp.transpose(da, _PERM_TO_Y)
    db = jnp.transpose(db, _PERM_TO_Y)
    da, db = pair(da, db, cc_v.y, nc[1], ok[1], (ay, ax, az))
    da = jnp.transpose(da, _PERM_Y_TO_Z)
    db = jnp.transpose(db, _PERM_Y_TO_Z)
    da, db = pair(da, db, cc_v.z, nc[2], ok[2], (az, ax, ay))
    return (jnp.transpose(da, _PERM_Z_TO_X),
            jnp.transpose(db, _PERM_Z_TO_X))


def relax_full_dual(da, db, cc_v: MaskViews, nc_v, ok_v, anisotropy,
                    rounds: int, kind: str = "ball_rail"):
    """`rounds` fused two-field rounds; the last round doubles as the
    convergence check (relax_full contract). Falls back to two separate
    relax_full calls off the Pallas path — the fields are independent, so
    the separated form is round-identical to the fused kernel. Returns
    ((da, db), (mask_a, mask_b)): per-field last-round change masks
    (field A under conv="negative" for ball_rail, field B / max2 exact)."""
    if not _use_pallas():
        if kind == "ball_rail":
            ra, ma = relax_full(da, cc_v, None, ok_v, anisotropy, rounds,
                                mode="euclid", clamp_positive=True,
                                conv="negative", return_mask=True)
            rb, mb = relax_full(db, cc_v, nc_v, None, anisotropy, rounds,
                                mode="node", return_mask=True)
        else:
            ra, ma = relax_full(da, cc_v, None, None, anisotropy, rounds,
                                mode="maxflood", return_mask=True)
            rb, mb = relax_full(db, cc_v, None, None, anisotropy, rounds,
                                mode="maxflood", return_mask=True)
        return (ra, rb), (ma, mb)

    def body(dd, _):
        return one_round_dual(dd[0], dd[1], cc_v, nc_v, ok_v, anisotropy,
                              kind), None

    (a1, b1), _ = jax.lax.scan(body, (da, db), None,
                               length=max(int(rounds), 1) - 1)
    na, nb = one_round_dual(a1, b1, cc_v, nc_v, ok_v, anisotropy, kind)
    if kind == "ball_rail":
        mask_a = (jnp.where(na <= 0, na, INF)
                  != jnp.where(a1 <= 0, a1, INF))
    else:
        mask_a = na != a1
    mask_b = nb != b1
    return (na, nb), (mask_a, mask_b)


def relax_escalated_dual(da, db, cc_v: MaskViews, nc_v, ok_v, anisotropy,
                         rounds: int, kind: str = "ball_rail",
                         extra_stages: int = 2, extra_rounds: int = 4):
    """relax_full_dual plus bounded on-device escalation, jointly gated:
    an extra stage runs when EITHER field's mask changed. Extra rounds on
    an already-converged field are exact no-ops (an unchanged full round
    proves the min-plus/maxflood fixpoint), so per-field results equal
    the separately-escalated relax_escalated outputs."""
    (da, db), (ma, mb) = relax_full_dual(da, db, cc_v, nc_v, ok_v,
                                         anisotropy, rounds, kind)

    def more(args):
        (aa, bb), _ = args
        return relax_full_dual(aa, bb, cc_v, nc_v, ok_v, anisotropy,
                               int(extra_rounds), kind)

    for _ in range(int(extra_stages)):
        (da, db), (ma, mb) = jax.lax.cond(
            jnp.any(ma) | jnp.any(mb), more, lambda a: a, ((da, db), (ma, mb)))
    return (da, db), (ma, mb)


def relax_escalated(d, cc_v: MaskViews, nc_v, ok_v, anisotropy, rounds: int,
                    mode: str = "euclid", clamp_positive: bool = False,
                    conv: str = "exact", extra_stages: int = 2,
                    extra_rounds: int = 4):
    """relax_full plus bounded ON-DEVICE escalation: each extra stage runs
    `extra_rounds` more rounds under a lax.cond gated on the previous
    stage's change mask, so converged volumes pay only the jnp.any
    reduction while winding components deepen without a host round-trip
    (keeps the gengine's lock-step loop pipelined). Data-dependent
    while_loop fixpoints miscompile on the tunneled TPU backend; a
    bounded chain of conds compiles correctly (validated on hardware by
    notes/gsweep_tpu_check.py). Returns (d, changed_mask) from the LAST
    executed stage."""
    d, mask = relax_full(d, cc_v, nc_v, ok_v, anisotropy, rounds, mode,
                         clamp_positive, conv, return_mask=True)

    def more(args):
        dd, _ = args
        return relax_full(dd, cc_v, nc_v, ok_v, anisotropy,
                          int(extra_rounds), mode, clamp_positive, conv,
                          return_mask=True)

    for _ in range(int(extra_stages)):
        d, mask = jax.lax.cond(jnp.any(mask), more, lambda a: a, (d, mask))
    return d, mask
