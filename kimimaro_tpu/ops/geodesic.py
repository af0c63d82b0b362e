"""Frontier-parallel shortest-path fields on voxel grids (device).

TPU-native replacement for the `dijkstra3d` C++ dependency
(/root/reference/kimimaro/trace.py:139-145,154-158,240-244) and for the
multi-source invalidation ball (`dijkstra_invalidation.hpp:239-332`).

Design: heap-based Dijkstra is inherently serial; on TPU we compute the same
distances as the fixpoint of monotone relaxation ("label-correcting" SSSP).
The relaxation schedule is a set of six *directional plane sweeps*
(+-x, +-y, +-z) executed as `lax.scan`s: a sweep along +x updates plane i
from the already-updated plane i-1 via the nine (dx=-1, dy, dz) offsets, so
distance propagates across the whole volume along any x-monotone path in a
single pass. One round of six sweeps covers all 26 offsets; rounds repeat to
a fixpoint, so the result is *exactly* the Dijkstra distance (number of
rounds scales with the number of direction reversals of the geodesics, not
with their voxel length). All sweeps are dense vector ops — no heaps, no
data-dependent control flow inside jit.

Two edge-cost modes, matching the reference:
  - euclidean: step cost = anisotropic length of the offset
    (dijkstra3d.euclidean_distance_field semantics)
  - node: cost of entering voxel v = field[v]
    (dijkstra3d.dijkstra / parental_field semantics on a weight field)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stencils import graph_allows, neighborhood_offsets, shifted

INF = np.float32(np.inf)

# the 26 offsets in deterministic lexicographic order; parent codes index
# into this list (sentinel 26 = "is a source / no parent")
OFFSETS26 = neighborhood_offsets(26)

_PALLAS_SWEEPS: Optional[bool] = None


def use_pallas_sweeps() -> bool:
    """Use the fused Pallas sweep kernel on TPU backends (one launch per
    sweep instead of one XLA op per plane); the XLA scan path serves CPU
    and voxel_graph cases. Resolved once, at first field computation."""
    global _PALLAS_SWEEPS
    if _PALLAS_SWEEPS is None:
        try:
            plat = jax.default_backend()
        except Exception:
            plat = "cpu"
        _PALLAS_SWEEPS = plat in ("tpu", "axon")
    return _PALLAS_SWEEPS


def set_pallas_sweeps(enabled: Optional[bool]) -> None:
    global _PALLAS_SWEEPS
    _PALLAS_SWEEPS = enabled


def _plane_offsets(axis: int, direction: int):
    """The 9 offsets with offset[axis] == -direction (i.e. reaching the
    current plane from the previously-swept plane)."""
    return [o for o in OFFSETS26 if o[axis] == -direction]


def _off_cost(off, anisotropy) -> np.float32:
    w = np.asarray(anisotropy, dtype=np.float64)
    return np.float32(np.sqrt(np.sum((np.array(off, dtype=np.float64) * w) ** 2)))


def _scan_sweep_axis0(d, ok, nc, anis_perm, node_mode: bool,
                      clamp_positive: bool):
    """Scan-form +axis0 sweep of ONE (n, H, W) volume (axis-0-first layout,
    direction already folded in by the caller via flips)."""
    costs9 = []
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            costs9.append((
                (dy, dz),
                np.float32(np.sqrt(
                    anis_perm[0] ** 2
                    + (dy * anis_perm[1]) ** 2
                    + (dz * anis_perm[2]) ** 2
                )),
            ))

    def step(prev, x):
        cur, okc, ncc = x
        cand = jnp.full_like(cur, INF)
        for (dy, dz), c in costs9:
            s = shifted(prev, (dy, dz), INF)
            if node_mode:
                cand = jnp.minimum(cand, s)
            else:
                cand = jnp.minimum(cand, s + c)
        if node_mode:
            cand = cand + ncc
        new = jnp.where(okc, jnp.minimum(cur, cand), INF)
        if clamp_positive:
            new = jnp.where(new > 0.0, INF, new)
        return new, new

    _, rest = jax.lax.scan(step, d[0], (d[1:], ok[1:], nc[1:]))
    return jnp.concatenate([d[:1], rest], axis=0)


@functools.lru_cache(maxsize=None)
def _axis0_sweep_core(anis_perm, node_mode: bool, clamp_positive: bool,
                      batched_pallas: bool):
    """custom-vmap'd axis0 sweep: per-lane it is the scan form; under vmap
    it lowers to ONE batched Pallas launch (grid over planes, lanes inside
    each block) instead of XLA's vmapped scan — which both miscompiles at
    wide batch on the TPU backend and pays per-plane dispatch overhead."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(d, ok, nc):
        return _scan_sweep_axis0(d, ok, nc, anis_perm, node_mode,
                                 clamp_positive)

    @core.def_vmap
    def rule(axis_size, in_batched, d, ok, nc):
        db, okb, ncb = in_batched
        if not db:
            d = jnp.broadcast_to(d[None], (axis_size,) + d.shape)
        if not okb:
            ok = jnp.broadcast_to(ok[None], (axis_size,) + ok.shape)
        if not ncb:
            nc = jnp.broadcast_to(nc[None], (axis_size,) + nc.shape)
        if batched_pallas:
            from . import pallas_sweep

            out = pallas_sweep.sweep_axis0_batched(
                d, ok, nc, anis_perm, node_mode, clamp_positive
            )
        else:
            out = jax.vmap(
                lambda dd, oo, nn: _scan_sweep_axis0(
                    dd, oo, nn, anis_perm, node_mode, clamp_positive
                )
            )(d, ok, nc)
        return out, True

    return core


def _relax_criterion(nd, d, conv: str):
    if conv == "reach":
        return jnp.any(jnp.isfinite(nd) != jnp.isfinite(d))
    if conv == "negative":
        return jnp.any(
            jnp.where(nd <= 0, nd, INF) != jnp.where(d <= 0, d, INF)
        )
    return jnp.any(nd != d)


def _batched_relax_pallas(d, ok, nc, anisotropy, node_mode: bool,
                          clamp_positive: bool, rounds: int, conv: str,
                          vg=None):
    """Full multi-round relaxation of a BATCH (B,X,Y,Z) with minimal HBM
    traffic: ok/nc move into each axis layout once (not once per sweep),
    ascending/descending pairs share one layout (descending runs through
    reversed Pallas index maps, no data flips), and d moves layouts twice
    per non-leading axis per round. `vg` (optional): per-lane cc3d
    voxel_graph bitfields — edges ride into the Pallas kernels via
    per-layout GRAPH_BITS tables, so self-touch volumes get full-width
    lanes too."""
    from . import pallas_sweep
    from .stencils import GRAPH_BITS

    # Per axis, lay the volume out (B, swept, H, W) with the LARGER plane
    # dim in the lane (last) position: TPU tiles pad the lane dim to 128,
    # so a thin crop dim there amplifies every sweep's DMA by up to 8x.
    axis_cfg = []
    oks, ncs, vgs = [], [], []
    for a in range(3):
        rem = [i for i in range(3) if i != a]
        h_dim, w_dim = rem
        if d.shape[1 + w_dim] < d.shape[1 + h_dim]:
            h_dim, w_dim = w_dim, h_dim
        perm_in = (0, 1 + a, 1 + h_dim, 1 + w_dim)
        perm_out = tuple(int(np.argsort(perm_in)[i]) for i in range(4))
        anis_perm = (
            float(anisotropy[a]), float(anisotropy[h_dim]),
            float(anisotropy[w_dim]),
        )
        # GRAPH_BITS of -o per (descending, dy, dz), with o in the
        # ORIGINAL frame: o[a] = -direction (+1 when descending),
        # o[h_dim] = dy, o[w_dim] = dz — matching _sweep's neg_o rule
        bits = []
        for desc in (False, True):
            row = []
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    o = [0, 0, 0]
                    o[a] = 1 if desc else -1
                    o[h_dim] = dy
                    o[w_dim] = dz
                    row.append(GRAPH_BITS[tuple(-c for c in o)])
            bits.append(tuple(row))
        identity = perm_in == (0, 1, 2, 3)
        axis_cfg.append((perm_in, perm_out, anis_perm, identity,
                         tuple(bits)))
        oks.append(ok if identity else jnp.transpose(ok, perm_in))
        ncs.append(nc if identity else jnp.transpose(nc, perm_in))
        if vg is not None:
            vgs.append(vg if identity else jnp.transpose(vg, perm_in))

    def one_round(dd):
        for a, (perm_in, perm_out, anis_perm, identity,
                bits) in enumerate(axis_cfg):
            dm = dd if identity else jnp.transpose(dd, perm_in)
            for di, desc in enumerate((False, True)):
                dm = pallas_sweep.sweep_axis0_batched(
                    dm, oks[a], ncs[a], anis_perm, node_mode,
                    clamp_positive, descending=desc,
                    vg=vgs[a] if vg is not None else None,
                    bits9=bits[di] if vg is not None else None,
                )
            dd = dm if identity else jnp.transpose(dm, perm_out)
        return dd

    def lane_changed(nd, dd):
        axes = tuple(range(1, nd.ndim))
        if conv == "reach":
            return jnp.any(jnp.isfinite(nd) != jnp.isfinite(dd), axis=axes)
        if conv == "negative":
            return jnp.any(
                jnp.where(nd <= 0, nd, INF) != jnp.where(dd <= 0, dd, INF),
                axis=axes,
            )
        return jnp.any(nd != dd, axis=axes)

    def body(carry, _):
        dd, _ = carry
        nd = one_round(dd)
        return (nd, lane_changed(nd, dd)), None

    (d, changed), _ = jax.lax.scan(
        body, (d, jnp.ones((d.shape[0],), bool)), None,
        length=int(rounds) + 1,
    )
    return d, ~changed


@functools.lru_cache(maxsize=None)
def _relax_rounds_core(anisotropy, node_mode: bool, clamp_positive: bool,
                       rounds: int, conv: str, batched_pallas: bool,
                       has_vg: bool = False):
    """custom-vmap'd multi-round relaxation: per-lane it is the scan-sweep
    loop; under vmap it lowers to _batched_relax_pallas on TPU. has_vg
    threads a voxel_graph operand through both paths."""
    from jax.custom_batching import custom_vmap

    def _rounds_scan(d, ok, nc, sweep_fn):
        def one_round(dd):
            for a in range(3):
                for direction in (1, -1):
                    dd = sweep_fn(dd, ok, nc, a, direction)
            return dd

        def body(carry, _):
            dd, _ = carry
            nd = one_round(dd)
            return (nd, _relax_criterion(nd, dd, conv)), None

        (d, changed), _ = jax.lax.scan(
            body, (d, jnp.bool_(True)), None, length=int(rounds) + 1
        )
        return d, ~changed

    def _lane_scan(d, ok, nc, vg):
        return _rounds_scan(
            d, ok, nc,
            lambda dd, o, n, a, direc: _sweep(
                dd, o, n if node_mode else None, a, direc, anisotropy,
                clamp_positive, voxel_graph=vg, pallas=False,
            ),
        )

    @custom_vmap
    def core(d, ok, nc, vg):
        return _lane_scan(d, ok, nc, vg if has_vg else None)

    @core.def_vmap
    def rule(axis_size, in_batched, d, ok, nc, vg):
        db, okb, ncb, vgb = in_batched
        if not db:
            d = jnp.broadcast_to(d[None], (axis_size,) + d.shape)
        if not okb:
            ok = jnp.broadcast_to(ok[None], (axis_size,) + ok.shape)
        if not ncb:
            nc = jnp.broadcast_to(nc[None], (axis_size,) + nc.shape)
        if not vgb:
            vg = jnp.broadcast_to(vg[None], (axis_size,) + vg.shape)
        if batched_pallas:
            out, cflag = _batched_relax_pallas(
                d, ok, nc, anisotropy, node_mode, clamp_positive, rounds,
                conv, vg=vg if has_vg else None,
            )
        else:
            out, cflag = jax.vmap(
                lambda dd, oo, nn, vv: _lane_scan(
                    dd, oo, nn, vv if has_vg else None)
            )(d, ok, nc, vg)
        return (out, cflag), (True, True)

    return core


def relax_rounds_batchable(d, ok, nc, anisotropy, rounds: int,
                           clamp_positive: bool = False,
                           conv: str = "exact", voxel_graph=None):
    """Multi-round relaxation with a convergence flag, safe and fast under
    vmap (ONE custom-batching boundary around the whole round loop: ok/nc
    layouts hoisted, no flips). voxel_graph (optional) rides into the
    batched Pallas kernels as a uint32 bitfield operand."""
    anis = tuple(float(a) for a in anisotropy)
    node_mode = nc is not None
    nc_arr = nc if node_mode else jnp.zeros_like(d)
    has_vg = voxel_graph is not None
    vg_arr = (voxel_graph.astype(jnp.uint32) if has_vg
              else jnp.zeros(d.shape, jnp.uint32))
    core = _relax_rounds_core(
        anis, node_mode, bool(clamp_positive), int(rounds), conv,
        _use_batched_pallas(), has_vg,
    )
    return core(d, ok, nc_arr, vg_arr)


def _use_batched_pallas() -> bool:
    """Batched Pallas sweeps engage on the TPU backend (or when interpret
    mode is forced for CPU equivalence tests)."""
    from . import pallas_sweep

    if pallas_sweep.INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _sweep(dist, ok, node_cost, axis, direction, anisotropy, clamp_positive,
           voxel_graph=None, pallas=None):
    """One directional plane sweep along `axis` in `direction` (+1/-1).

    voxel_graph (optional): cc3d-convention connectivity bitfield; a
    candidate reaching v from u = v + o is admitted only when u permits
    movement along -o (reference dijkstra_invalidation.hpp:150-191).

    pallas: force/forbid the fused Pallas kernel. IMPORTANT: under vmap the
    Pallas grid serializes the batch dimension, so batched callers (the
    trace engine) must pass pallas=False and keep the scan form, whose
    plane steps vectorize across the batch.
    """
    n = dist.shape[axis]
    if n <= 1:
        return dist

    if pallas is None:
        pallas = use_pallas_sweeps()
    if voxel_graph is None and pallas:
        from . import pallas_sweep

        anis_perm = (float(anisotropy[axis]),) + tuple(
            float(anisotropy[i]) for i in range(3) if i != axis
        )
        d2 = jnp.moveaxis(dist, axis, 0)
        ok2 = jnp.moveaxis(ok, axis, 0)
        nc2 = (
            jnp.moveaxis(node_cost, axis, 0)
            if node_cost is not None
            else jnp.zeros_like(d2)
        )
        if direction < 0:
            d2, ok2, nc2 = d2[::-1], ok2[::-1], nc2[::-1]
        out = pallas_sweep.sweep_axis0(
            d2, ok2, nc2, anis_perm, node_cost is not None,
            bool(clamp_positive),
        )
        if direction < 0:
            out = out[::-1]
        return jnp.moveaxis(out, 0, axis)

    if voxel_graph is None:
        # scan/batched-Pallas core: per-lane the scan form; under vmap a
        # custom batching rule emits ONE Pallas launch with lanes inside
        # each block (the XLA-vmapped scan both miscompiles at wide batch
        # on the TPU backend and pays per-plane dispatch overhead)
        anis_perm = (float(anisotropy[axis]),) + tuple(
            float(anisotropy[i]) for i in range(3) if i != axis
        )
        d2 = jnp.moveaxis(dist, axis, 0)
        ok2 = jnp.moveaxis(ok, axis, 0)
        nc2 = (
            jnp.moveaxis(node_cost, axis, 0)
            if node_cost is not None
            else jnp.zeros_like(d2)
        )
        if direction < 0:
            d2, ok2, nc2 = d2[::-1], ok2[::-1], nc2[::-1]
        core = _axis0_sweep_core(
            anis_perm, node_cost is not None, bool(clamp_positive),
            _use_batched_pallas(),
        )
        out = core(d2, ok2, nc2)
        if direction < 0:
            out = out[::-1]
        return jnp.moveaxis(out, 0, axis)

    offs = _plane_offsets(axis, direction)
    # in-plane shifts of the previous plane: drop the swept axis component
    plane_shifts = []
    for o in offs:
        po = tuple(o[a] for a in range(3) if a != axis)
        neg_o = tuple(-c for c in o)
        plane_shifts.append((po, neg_o, _off_cost(o, anisotropy)))

    d = jnp.moveaxis(dist, axis, 0)
    m = jnp.moveaxis(ok, axis, 0)
    nc = None if node_cost is None else jnp.moveaxis(node_cost, axis, 0)
    vg = None if voxel_graph is None else jnp.moveaxis(voxel_graph, axis, 0)

    if direction < 0:
        d = d[::-1]
        m = m[::-1]
        nc = None if nc is None else nc[::-1]
        vg = None if vg is None else vg[::-1]

    def step(prev, x):
        cur, okc = x[0], x[1]
        ncc = x[2] if nc is not None else None
        vgp = x[-1] if vg is not None else None
        cand = jnp.full_like(cur, INF)
        for po, neg_o, c in plane_shifts:
            s = shifted(prev, po, INF)
            if vgp is not None:
                allowed = shifted(graph_allows(vgp, neg_o), po, False)
                s = jnp.where(allowed, s, INF)
            if ncc is None:
                cand = jnp.minimum(cand, s + c)
            else:
                cand = jnp.minimum(cand, s)
        if ncc is not None:
            cand = cand + ncc
        new = jnp.where(okc, jnp.minimum(cur, cand), INF)
        if clamp_positive:
            new = jnp.where(new > 0.0, INF, new)
        return new, new

    xs = [d[1:], m[1:]]
    if nc is not None:
        xs.append(nc[1:])
    if vg is not None:
        xs.append(vg[:-1])  # the PREVIOUS plane's permissions
    _, rest = jax.lax.scan(step, d[0], tuple(xs))
    out = jnp.concatenate([d[:1], rest], axis=0)

    if direction < 0:
        out = out[::-1]
    return jnp.moveaxis(out, 0, axis)


@functools.partial(
    jax.jit,
    static_argnames=(
        "anisotropy", "node_mode", "clamp_positive", "rounds", "has_vg",
        "conv",
    ),
)
def _relax_stage(
    init_dist,
    ok,
    node_cost,
    voxel_graph,
    anisotropy: Tuple[float, float, float],
    node_mode: bool,
    clamp_positive: bool,
    rounds: int,
    has_vg: bool = False,
    conv: str = "exact",
):
    """`rounds` full 6-sweep rounds with a STATIC trip count, plus one
    checking round. Returns (dist, converged).

    NB deliberately not a `while(any(nd != d))` fixpoint: that program
    miscompiles on TPU (hangs the worker standalone; exits early under
    vmap with >= 8 lanes). Static fori_loop + explicit convergence check
    is correct everywhere; callers escalate unconverged results.
    """
    nc = node_cost if node_mode else None
    vg = voxel_graph if has_vg else None

    def one_round(d):
        for axis in range(3):
            for direction in (1, -1):
                d = _sweep(d, ok, nc, axis, direction, anisotropy,
                           clamp_positive, voxel_graph=vg)
        return d

    # one scan body with a trailing-changed flag (criterion matched to
    # the consumed quantity — see ops.fused_trace._relax_rounds); a
    # separate check round would double the HLO body and volume-scale
    # compile times
    def body(carry, _):
        d, _ = carry
        nd = one_round(d)
        if conv == "reach":
            changed = jnp.any(jnp.isfinite(nd) != jnp.isfinite(d))
        elif conv == "negative":
            changed = jnp.any(
                jnp.where(nd <= 0, nd, INF) != jnp.where(d <= 0, d, INF)
            )
        else:
            changed = jnp.any(nd != d)
        return (nd, changed), None

    (d, changed), _ = jax.lax.scan(
        body, (init_dist, jnp.bool_(True)), None, length=int(rounds) + 1
    )
    return d, ~changed


def distance_field(
    ok_mask,
    init_dist,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    node_cost=None,
    clamp_positive: bool = False,
    max_rounds: int = 4096,
    voxel_graph=None,
    rounds: Optional[int] = None,
    conv: str = "exact",
) -> jnp.ndarray:
    """Exact SSSP distance field to fixpoint.

    ok_mask: bool volume of traversable voxels.
    init_dist: float32 volume, +inf everywhere except the sources (their
      initial values; 0 for plain SSSP, negative radii for invalidation).
    node_cost: if given, edge cost of entering v = node_cost[v]
      (dijkstra3d field semantics); else anisotropic euclidean step costs.
    clamp_positive: values > 0 are reset to +inf each sweep — used by the
      invalidation ball so the expansion halts at the radius boundary.
    voxel_graph: optional cc3d-convention connectivity bitfield.
    rounds: if given, run exactly that many bounded rounds WITHOUT host
      synchronization (jit-safe; result may be unconverged — only for
      traced callers that escalate themselves). Default: host-driven
      warm-restart escalation to the exact fixpoint (up to max_rounds).
    """
    ok = jnp.asarray(ok_mask, dtype=bool)
    init = jnp.asarray(init_dist, dtype=jnp.float32)
    nc = (
        jnp.zeros_like(init)
        if node_cost is None
        else jnp.asarray(node_cost, dtype=jnp.float32)
    )
    vg = (
        jnp.zeros((1, 1, 1), dtype=jnp.uint32)
        if voxel_graph is None
        else jnp.asarray(voxel_graph).astype(jnp.uint32)
    )
    anis = tuple(float(a) for a in anisotropy)
    node_mode = node_cost is not None
    has_vg = voxel_graph is not None
    d = jnp.where(ok, init, INF)

    if rounds is None and isinstance(d, jax.core.Tracer):
        # inside another trace no host-synced escalation is possible:
        # run one bounded stage (callers that jit this pass a suitable
        # max_rounds; convergence is then their contract)
        rounds = min(int(max_rounds), 64)

    if rounds is not None:
        d, _ = _relax_stage(d, ok, nc, vg, anis, node_mode,
                            bool(clamp_positive), int(rounds), has_vg=has_vg,
                            conv=conv)
        return d

    # host-driven escalation: monotone min-plus relaxation warm-restarts
    # exactly, so each stage continues from the previous field. ONE fixed
    # stage size — extra launches of a cached program are cheap; every new
    # round-count variant is a multi-minute XLA compile at volume scale
    done = 0
    while done < int(max_rounds):
        d, cflag = _relax_stage(d, ok, nc, vg, anis, node_mode,
                                bool(clamp_positive), 6, has_vg=has_vg,
                                conv=conv)
        done += 7
        if bool(cflag):
            break
    return d


def euclidean_distance_field(
    ok_mask,
    source,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    return_max_location: bool = False,
    voxel_graph=None,
):
    """Geodesic (foreground-constrained) anisotropic euclidean distance from
    source voxel(s). Matches dijkstra3d.euclidean_distance_field semantics
    (reference trace.py:139-145): unreachable voxels are +inf.

    source: (3,) voxel coordinate or (k,3) array of sources.
    """
    ok = jnp.asarray(ok_mask, dtype=bool)
    init = jnp.full(ok.shape, INF, dtype=jnp.float32)
    src = np.asarray(source, dtype=np.int64).reshape(-1, 3)
    init = init.at[src[:, 0], src[:, 1], src[:, 2]].set(0.0)
    dist = distance_field(ok, init, anisotropy, voxel_graph=voxel_graph)
    if not return_max_location:
        return dist
    finite = jnp.where(jnp.isfinite(dist), dist, -1.0)
    target = jnp.unravel_index(jnp.argmax(finite), dist.shape)
    return dist, target


@functools.partial(
    jax.jit, static_argnames=("anisotropy", "node_mode", "has_vg")
)
def _parent_field_impl(dist, ok, node_cost, voxel_graph, anisotropy,
                       node_mode, has_vg=False):
    """Parent direction codes (int8 index into OFFSETS26; 26 = source/none).

    At the fixpoint, dist[v] == min_u (dist[u] + cost(u->v)) exactly (the
    stored float was produced by that very addition), so a post-hoc argmin
    reconstructs a valid shortest-path tree with a deterministic (offset
    order) tie break.
    """
    best = jnp.full(dist.shape, INF, dtype=jnp.float32)
    parent = jnp.full(dist.shape, 26, dtype=jnp.int8)
    for k, off in enumerate(OFFSETS26):
        s = shifted(dist, off, INF)
        if has_vg:
            neg = tuple(-c for c in off)
            allowed = shifted(graph_allows(voxel_graph, neg), off, False)
            s = jnp.where(allowed, s, INF)
        if node_mode:
            cand = s + node_cost
        else:
            cand = s + _off_cost(off, anisotropy)
        better = cand < best
        best = jnp.where(better, cand, best)
        parent = jnp.where(better, jnp.int8(k), parent)

    # voxels where no incoming edge reproduces dist are sources (or inf)
    is_consistent = best <= dist
    parent = jnp.where(is_consistent & ok & jnp.isfinite(dist), parent, 26)
    return parent


def parent_field(
    dist,
    ok_mask,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    node_cost=None,
    voxel_graph=None,
):
    ok = jnp.asarray(ok_mask, dtype=bool)
    nc = (
        jnp.zeros_like(dist)
        if node_cost is None
        else jnp.asarray(node_cost, dtype=jnp.float32)
    )
    vg = (
        jnp.zeros((1, 1, 1), dtype=jnp.uint32)
        if voxel_graph is None
        else jnp.asarray(voxel_graph).astype(jnp.uint32)
    )
    return _parent_field_impl(
        jnp.asarray(dist, dtype=jnp.float32),
        ok,
        nc,
        vg,
        tuple(float(a) for a in anisotropy),
        node_cost is not None,
        has_vg=voxel_graph is not None,
    )


def invalidation_ball(
    ok_mask,
    dbf,
    path_voxels,
    scale: float,
    const: float,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    voxel_graph=None,
) -> jnp.ndarray:
    """Rolling-ball invalidation restricted to the connected component.

    TPU-native equivalent of skeletontricks.roll_invalidation_ball_inside_
    component (reference trace.py:253-259, dijkstra_invalidation.hpp:239-332):
    for each path vertex v, every foreground voxel within geodesic distance
    scale*DBF[v] + const (physical units, 26-connected steps) is invalidated.

    Implemented as a multi-source capped relaxation: sources start at
    -(scale*DBF[v]+const); positive values are clamped to +inf so the
    expansion stops exactly at the radius boundary. Returns a bool mask of
    invalidated voxels.
    """
    ok = jnp.asarray(ok_mask, dtype=bool)
    dbf = jnp.asarray(dbf, dtype=jnp.float32)
    pv = np.asarray(path_voxels, dtype=np.int64).reshape(-1, 3)
    radii = scale * dbf[pv[:, 0], pv[:, 1], pv[:, 2]] + const
    init = jnp.full(ok.shape, INF, dtype=jnp.float32)
    # multiple path vertices may map to the same voxel: keep the largest ball
    init = init.at[pv[:, 0], pv[:, 1], pv[:, 2]].min(-radii)
    # sources expand even when they were invalidated by an earlier ball
    # (the C++ seeds the heap before checking labels)
    ok = ok.at[pv[:, 0], pv[:, 1], pv[:, 2]].set(True)
    dist = distance_field(
        ok, init, anisotropy, clamp_positive=True, voxel_graph=voxel_graph,
        conv="negative",
    )
    return dist <= 0.0


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds"))
def _voronoi_stage(init_dist, init_feat, ok, anisotropy, rounds: int):
    """Jointly relax (distance, nearest-seed-id) to fixpoint — the
    dijkstra3d.euclidean_distance_field(return_feature_map=True) equivalent
    (reference utility.py:613-617)."""

    def sweep(dist, feat, axis, direction):
        n = dist.shape[axis]
        if n <= 1:
            return dist, feat
        offs = _plane_offsets(axis, direction)
        plane_shifts = [
            (tuple(o[a] for a in range(3) if a != axis), _off_cost(o, anisotropy))
            for o in offs
        ]

        d = jnp.moveaxis(dist, axis, 0)
        f = jnp.moveaxis(feat, axis, 0)
        m = jnp.moveaxis(ok, axis, 0)
        if direction < 0:
            d, f, m = d[::-1], f[::-1], m[::-1]

        def step(carry, x):
            pd, pf = carry
            cur_d, cur_f, okc = x
            best_d = jnp.full_like(cur_d, INF)
            best_f = jnp.zeros_like(cur_f)
            for po, c in plane_shifts:
                sd = shifted(pd, po, INF) + c
                sf = shifted(pf, po, 0)
                better = sd < best_d
                best_d = jnp.where(better, sd, best_d)
                best_f = jnp.where(better, sf, best_f)
            take = okc & (best_d < cur_d)
            nd = jnp.where(take, best_d, jnp.where(okc, cur_d, INF))
            nf = jnp.where(take, best_f, cur_f)
            return (nd, nf), (nd, nf)

        (_, _), (rd, rf) = jax.lax.scan(step, (d[0], f[0]), (d[1:], f[1:], m[1:]))
        out_d = jnp.concatenate([d[:1], rd], axis=0)
        out_f = jnp.concatenate([f[:1], rf], axis=0)
        if direction < 0:
            out_d, out_f = out_d[::-1], out_f[::-1]
        return jnp.moveaxis(out_d, 0, axis), jnp.moveaxis(out_f, 0, axis)

    def one_round(state):
        d, f = state
        for axis in range(3):
            for direction in (1, -1):
                d, f = sweep(d, f, axis, direction)
        return d, f

    d0 = jnp.where(ok, init_dist, INF)

    def body(carry, _):
        (d, f), _ = carry
        nd, nf = one_round((d, f))
        changed = jnp.any(nd != d) | jnp.any(nf != f)
        return ((nd, nf), changed), None

    ((d, f), changed), _ = jax.lax.scan(
        body, ((d0, init_feat), jnp.bool_(True)), None,
        length=int(rounds) + 1,
    )
    return d, f, ~changed


def voronoi_feature_field(
    ok_mask, seeds, anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    max_rounds: int = 4096,
):
    """Multi-source geodesic EDF + nearest-seed feature map.

    seeds: (k, 3) voxel coords. Feature ids are 1-based seed indices
    (0 = unreached). Returns (dist, features int32).
    """
    ok = jnp.asarray(ok_mask, dtype=bool)
    seeds = np.asarray(seeds, dtype=np.int64).reshape(-1, 3)
    init_d = jnp.full(ok.shape, INF, dtype=jnp.float32)
    init_f = jnp.zeros(ok.shape, dtype=jnp.int32)
    ids = jnp.arange(1, seeds.shape[0] + 1, dtype=jnp.int32)
    # later seeds overwrite earlier at duplicate coords (deterministic)
    init_d = init_d.at[seeds[:, 0], seeds[:, 1], seeds[:, 2]].set(0.0)
    init_f = init_f.at[seeds[:, 0], seeds[:, 1], seeds[:, 2]].set(ids)
    anis = tuple(float(a) for a in anisotropy)
    d, f = init_d, init_f
    done = 0
    while done < int(max_rounds):
        d, f, conv = _voronoi_stage(d, f, ok, anis, 6)
        done += 7
        if bool(conv):
            break
    return d, f


@functools.partial(jax.jit, static_argnames=("anisotropy",))
def _cube_mask(dbf, path, scale, const, anisotropy):
    shape = dbf.shape
    w = np.asarray(anisotropy, dtype=np.float32)
    coords = [
        jax.lax.broadcasted_iota(jnp.int32, shape, a).astype(jnp.float32)
        for a in range(3)
    ]

    def step(mask, vert):
        vx = vert.astype(jnp.float32)
        r = scale * dbf[vert[0], vert[1], vert[2]] + const
        inside = jnp.ones(shape, dtype=bool)
        for a in range(3):
            half = r / w[a]
            inside = inside & (jnp.abs(coords[a] - vx[a]) <= half)
        valid = vert[0] >= 0
        return mask | (inside & valid), None

    mask0 = jnp.zeros(shape, dtype=bool)
    mask, _ = jax.lax.scan(step, mask0, path)
    return mask


def invalidation_cube(
    labels,
    dbf,
    path_voxels,
    scale: float,
    const: float,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
):
    """Cube-shaped TEASAR invalidation: zero all labels within the
    axis-aligned box of physical half-extent scale*DBF[v]+const around each
    path vertex, crossing label gaps (the legacy semantics of
    skeletontricks.roll_invalidation_cube, reference
    skeletontricks.hpp:42-155). Returns (n_invalidated, labels)."""
    labels = jnp.asarray(labels)
    dbf = jnp.asarray(dbf, dtype=jnp.float32)
    pv = jnp.asarray(
        np.asarray(path_voxels, dtype=np.int32).reshape(-1, 3)
    )
    mask = _cube_mask(
        dbf, pv, jnp.float32(scale), jnp.float32(const),
        tuple(float(a) for a in anisotropy),
    )
    fg = labels != 0
    n_inv = jnp.sum(mask & fg)
    out = jnp.where(mask, 0, labels)
    return n_inv, out


def flood_fill_bounded(seed_mask, ok_mask, connectivity: int, rounds: int):
    """Jit-safe bounded flood: returns (reachable mask, converged flag).
    Traced callers escalate on ~converged (e.g. xsarea section floods)."""
    ok = jnp.asarray(ok_mask, dtype=bool)
    init = jnp.where(jnp.asarray(seed_mask, dtype=bool) & ok, 0.0, INF)
    if connectivity == 26:
        d0 = jnp.where(ok, init, INF)
        d, conv = _relax_stage(
            d0, ok, jnp.zeros_like(d0), jnp.zeros((1, 1, 1), jnp.uint32),
            (1.0, 1.0, 1.0), False, False, int(rounds), has_vg=False,
            conv="reach",
        )
    else:
        d, conv = _flood6_stage(ok, init, int(rounds))
    return jnp.isfinite(d), conv


def flood_fill(seed_mask, ok_mask, connectivity: int = 6,
               rounds: Optional[int] = None) -> jnp.ndarray:
    """Binary reachability: all ok voxels connected to seed_mask.

    Uses the same sweep engine with unit costs. connectivity 6 or 26.
    rounds: bounded static-round form for traced callers (may under-flood;
    pair with a convergence check via flood_fill_stage) — default is the
    exact host-escalating form.
    """
    ok = jnp.asarray(ok_mask, dtype=bool)
    init = jnp.where(jnp.asarray(seed_mask, dtype=bool) & ok, 0.0, INF)
    if connectivity == 26:
        dist = distance_field(ok, init, (1.0, 1.0, 1.0), rounds=rounds,
                              conv="reach")
        return jnp.isfinite(dist)
    if rounds is not None:
        dist, _ = _flood6_stage(ok, init, int(rounds))
        return jnp.isfinite(dist)
    d = jnp.where(ok, init, INF)
    done = 0
    while done < 4096:
        d, conv = _flood6_stage(ok, d, 6)
        done += 7
        if bool(conv):
            break
    return jnp.isfinite(d)


@functools.partial(jax.jit, static_argnames=("rounds",))
def _flood6_stage(ok, init, rounds: int):
    """6-connected flood via the same sweep machinery (only the 6 axial
    offsets participate). Static rounds + convergence flag."""

    def sweep6(d, axis, direction):
        n = d.shape[axis]
        if n <= 1:
            return d
        dd = jnp.moveaxis(d, axis, 0)
        mm = jnp.moveaxis(ok, axis, 0)
        if direction < 0:
            dd = dd[::-1]
            mm = mm[::-1]

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
        # in-plane 4-neighbor propagation is covered by the other axes'
        # sweeps across rounds
        for axis in range(3):
            for direction in (1, -1):
                d = sweep6(d, axis, direction)
        return d

    dist0 = jnp.where(ok, init, INF)

    def body(carry, _):
        d, _ = carry
        nd = one_round(d)
        # reachability-stall convergence (only finiteness is consumed)
        return (nd, jnp.any(jnp.isfinite(nd) != jnp.isfinite(d))), None

    (d, changed), _ = jax.lax.scan(
        body, (dist0, jnp.bool_(True)), None, length=int(rounds) + 1
    )
    return d, ~changed
