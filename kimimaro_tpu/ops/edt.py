"""Multi-label anisotropic 3D Euclidean distance transform on device.

TPU-native replacement for the `edt` C++ dependency used by the reference
(/root/reference/kimimaro/intake.py:174-185, trace.py:112-117). Semantics:
for each voxel of label L, the distance to the nearest voxel of a different
label (label 0 = background gets distance 0), with per-axis anisotropic
weights; `black_border=True` additionally treats the volume boundary as
background.

Design: exact separable squared-distance transform as three axis passes.
Each pass is the masked min-plus parabola transform

    D_new[i] = min_j ( g(j) + w^2 (i-j)^2 ),
    g(j) = D_old[j] if label[j] == label[i] else 0

which is exactly the per-label binary Felzenszwalb pass, evaluated
brute-force as a tiled broadcast-reduce. O(n) lines x O(n^2) work maps onto
the VPU as large fused elementwise blocks (no data-dependent control flow,
no stacks), unlike the sequential envelope algorithm the CPU reference
ecosystem uses. A Pallas kernel variant tiles this through VMEM for the
512^3 benchmark volume.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(3.4e37)  # stand-in for +inf that survives arithmetic


def _axis_to_last(vol, axis):
    return jnp.moveaxis(vol, axis, -1)


@functools.partial(jax.jit, static_argnames=("w", "black_border", "has_wall"))
def _axial_pass(labels, wall, w: float, black_border: bool,
                has_wall: bool = False):
    """Exact first pass: squared distance along the FIRST axis to the
    nearest different-label voxel (O(n) run-boundary scans, not O(n^2)).

    labels: (n, B), transformed axis first (lane-aligned shifts). Within a
    run of equal labels [s, e], the nearest different voxel is at s-1 or
    e+1; run bounds come from cumulative max over label-change indices.
    """
    n, B = labels.shape
    idx = jnp.arange(n, dtype=jnp.int32)[:, None]

    def run_starts(lab, wl):
        change = jnp.concatenate(
            [jnp.zeros((1, B), dtype=bool), lab[1:] != lab[:-1]], axis=0
        )
        if has_wall:
            # a blocked edge (wall increment) breaks the run like a label
            # change (voxel_graph semantics)
            change = change | jnp.concatenate(
                [jnp.zeros((1, B), dtype=bool), wl[1:] != wl[:-1]], axis=0
            )
        return jax.lax.cummax(jnp.where(change, idx, 0), axis=0)

    # run [start, end] of equal labels containing each position
    start = run_starts(labels, wall)
    end = (n - 1) - run_starts(labels[::-1], wall[::-1])[::-1]

    has_left = start > 0
    has_right = end < n - 1
    left = (idx - start + 1).astype(jnp.float32)
    right = (end - idx + 1).astype(jnp.float32)
    if black_border:
        left = jnp.where(has_left, left, idx.astype(jnp.float32) + 1.0)
        right = jnp.where(
            has_right, right, jnp.float32(n) - idx.astype(jnp.float32)
        )
    else:
        left = jnp.where(has_left, left, BIG)
        right = jnp.where(has_right, right, BIG)

    d = jnp.minimum(left, right)
    d = jnp.minimum(d, BIG)
    return jnp.minimum((np.float32(w) * d) ** 2, BIG)


@functools.partial(
    jax.jit, static_argnames=("w", "black_border", "band", "has_wall")
)
def _parabola_pass_banded(d, labels, wall, w: float, black_border: bool,
                          band: int, has_wall: bool = False):
    """Banded min-plus parabola pass along the FIRST axis:

        D_new[i] = min_{|o|<=band} ( g(i+o) + w^2 o^2 ),
        g(j) = D_old[j] if label[j]==label[i] else 0

    Exact wherever the result satisfies D_new <= (band*w)^2 (a farther
    winner would cost more than that); the caller escalates the band where
    the guarantee fails. O(n * band) work as a lax.scan of shifted fused
    vector ops — the XLA-friendly form of the Felzenszwalb envelope.

    d, labels: (n, B) with the transformed axis FIRST so every shifted
    slice moves along the major axis and stays lane-aligned (minor-axis
    dynamic slices are slow on TPU).
    """
    n, B = d.shape
    w2 = np.float32(w) ** 2
    oob_g = np.float32(0.0) if black_border else BIG

    d_p = jnp.pad(d, ((band, band), (0, 0)), constant_values=BIG)
    l_p = jnp.pad(labels, ((band, band), (0, 0)), constant_values=0)
    v_p = jnp.pad(
        jnp.ones((n, 1), dtype=bool), ((band, band), (0, 0)),
        constant_values=False,
    )
    w_p = jnp.pad(wall, ((band, band), (0, 0)), constant_values=-1)

    def body(best, o):
        # o in [0, 2*band]; shift = o - band
        d_s = jax.lax.dynamic_slice(d_p, (o, 0), (n, B))
        l_s = jax.lax.dynamic_slice(l_p, (o, 0), (n, B))
        v_s = jax.lax.dynamic_slice(v_p, (o, 0), (n, 1))
        same = l_s == labels
        if has_wall:
            # positions in different wall segments are mutually invisible
            # along this line (a blocked edge acts as a boundary at the
            # wall position, like a label change)
            ww_s = jax.lax.dynamic_slice(w_p, (o, 0), (n, B))
            same = same & (ww_s == wall)
        g = jnp.where(v_s & same, d_s, jnp.where(v_s, 0.0, oob_g))
        off = (o - band).astype(jnp.float32)
        cand = g + w2 * off * off
        return jnp.minimum(best, cand), None

    best, _ = jax.lax.scan(
        body, jnp.full_like(d, BIG), jnp.arange(2 * band + 1, dtype=jnp.int32)
    )
    return jnp.minimum(best, d)


def _banded_with_escalation(d, labels, wall, w: float, black_border: bool,
                            n: int, has_wall: bool):
    """Run the banded parabola pass, doubling the band wherever the
    band-completeness guarantee (D <= (band*w)^2) fails. Each escalation
    recomputes from the same pass input, so the result is exact."""
    band = min(16, n - 1)
    out = _parabola_pass_banded(d, labels, wall, w, black_border, band, has_wall)
    if band >= n - 1:
        return out
    # single host sync: the banded result upper-bounds the true distance,
    # so max(out) directly yields a SUFFICIENT band for one exact re-pass
    thresh = (np.float32(w) * band) ** 2
    max_out = float(jnp.max(out))
    if max_out <= thresh:
        return out
    need = int(np.ceil(np.sqrt(max_out) / w)) + 1
    band = 16
    while band < need:  # power-of-two buckets bound the compile count
        band <<= 1
    band = min(band, n - 1)
    import os as _os

    if _os.environ.get("KIMIMARO_TPU_EDT_DEBUG", "0") != "0":
        import sys as _sys

        print(f"[edt] escalate w={w} band 16 -> {band} "
              f"(max_out={max_out:.1f})", file=_sys.stderr, flush=True)
    return _parabola_pass_banded(d, labels, wall, w, black_border, band, has_wall)


_AXIS_UNIT = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


def edtsq_jittable(
    labels,
    anisotropy: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    black_border: bool = False,
    band: int = 64,
) -> jnp.ndarray:
    """Squared multi-label EDT with a STATIC band — traceable inside an
    outer jit (no host-synced band escalation). Exact wherever distances
    fit the band; use `edtsq` for the adaptive host-driven version."""
    labels = jnp.asarray(labels)
    shape = labels.shape
    dummy_wall = jnp.zeros((1, 1), dtype=jnp.int32)

    d = jnp.full(shape, BIG, dtype=jnp.float32)
    first = True
    for axis in range(3):
        w = float(anisotropy[axis])
        n = shape[axis]
        if n == 1:
            if black_border:
                d = jnp.minimum(d, np.float32(w) ** 2)
            continue
        lab_t = jnp.moveaxis(labels, axis, 0).reshape(n, -1)
        if first:
            out = _axial_pass(lab_t, dummy_wall, w, bool(black_border))
            first = False
        else:
            d_t = jnp.moveaxis(d, axis, 0).reshape(n, -1)
            out = _parabola_pass_banded(
                d_t, lab_t, dummy_wall, w, bool(black_border),
                min(band, n - 1),
            )
        out = out.reshape(jnp.moveaxis(d, axis, 0).shape)
        d = jnp.moveaxis(out, 0, axis)
        d = jnp.where(labels == 0, 0.0, d)
    return d


def edtsq(
    labels,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    black_border: bool = False,
    voxel_graph=None,
) -> jnp.ndarray:
    """Squared multi-label anisotropic EDT. Returns float32, BIG where the
    distance is unbounded (single label, no black border).

    Pass structure: the first axis is the exact O(n) run-boundary scan
    (_axial_pass); later axes are banded min-plus parabola passes with
    automatic band escalation — O(n * band) instead of the O(n^2) brute
    envelope, with the band adapting to the thickest structure present.

    voxel_graph: optional cc3d-convention bitfield; a blocked axis edge
    acts as a label boundary in that axis pass (self-touch walls), tracked
    exactly via per-line wall-segment cumsums.
    """
    labels = jnp.asarray(labels)
    squeeze_2d = labels.ndim == 2
    if squeeze_2d:
        labels = labels[..., None]
        anisotropy = tuple(anisotropy) + (1.0,)
        if voxel_graph is not None:
            voxel_graph = jnp.asarray(voxel_graph)[..., None]
    assert labels.ndim == 3, "edt expects a 2D or 3D volume"
    shape = labels.shape
    has_vg = voxel_graph is not None
    vg = jnp.asarray(voxel_graph).astype(jnp.uint32) if has_vg else None

    from .stencils import graph_allows

    import os as _os
    import time as _tm

    _dbg = _os.environ.get("KIMIMARO_TPU_EDT_DEBUG", "0") != "0"
    _t0 = _tm.perf_counter()

    d = jnp.full(shape, BIG, dtype=jnp.float32)
    ndim_iter = 2 if squeeze_2d else 3  # 2D: borderless singleton z axis
    first = True
    for axis in range(ndim_iter):
        w = float(anisotropy[axis])
        n = shape[axis]
        if n == 1:
            # only contribution along a singleton axis is the black border
            if black_border:
                d = jnp.minimum(d, np.float32(w) ** 2)
            continue
        lab_t = jnp.moveaxis(labels, axis, 0).reshape(n, -1)
        if has_vg:
            # wall-segment index per line: increments at blocked +axis edges
            allow = graph_allows(vg, _AXIS_UNIT[axis])
            allow_t = jnp.moveaxis(allow, axis, 0).reshape(n, -1)
            blocked = jnp.concatenate(
                [jnp.zeros((1, lab_t.shape[1]), dtype=bool), ~allow_t[:-1]],
                axis=0,
            )
            wall = jnp.cumsum(blocked.astype(jnp.int32), axis=0)
        else:
            wall = jnp.zeros((1, 1), dtype=jnp.int32)
        if first:
            out = _axial_pass(lab_t, wall, w, bool(black_border), has_vg)
            first = False
        else:
            d_t = jnp.moveaxis(d, axis, 0).reshape(n, -1)
            out = _banded_with_escalation(
                d_t, lab_t, wall, w, bool(black_border), n, has_vg
            )
        out = out.reshape(jnp.moveaxis(d, axis, 0).shape)
        d = jnp.moveaxis(out, 0, axis)
        # background distances are zeroed on return and are never read by
        # foreground lines (different label => g=0), so suppress them now:
        # this keeps the band-escalation check foreground-only.
        d = jnp.where(labels == 0, 0.0, d)
        if _dbg:
            d.block_until_ready()
            import sys as _sys

            print(f"[edt] axis={axis} done at +{_tm.perf_counter()-_t0:.2f}s",
                  file=_sys.stderr, flush=True)
    if squeeze_2d:
        d = d[..., 0]
    return d


def edt(
    labels,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    black_border: bool = False,
    voxel_graph=None,
) -> jnp.ndarray:
    """Multi-label anisotropic euclidean distance transform (physical units).

    Drop-in for the reference's `edt.edt(...)` call sites
    (intake.py:178-183), including voxel_graph self-touch walls.
    """
    return jnp.sqrt(edtsq(labels, anisotropy, black_border, voxel_graph))
