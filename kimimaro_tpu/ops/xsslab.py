"""Slab-resampled cross sections: O(plane) work per sectioning query.

The first-generation kernel (ops.xsarea._sections_batch) floods the FULL
3D crop per vertex — work scales with crop volume x flood rounds, which
measured ~68x slower than the reference's xs3d. xs3d's insight is that a
cross section is intrinsically 2D (/root/reference/kimimaro/utility.py:
494-511 drives it per-vertex over a plane). This kernel restores that
scaling on TPU:

  1. Pick the dominant axis d = argmax_a |n_a| * s_a (host-side, queries
     grouped per axis; volume pre-transposed so d is LAST). The plane is
     then a height field z*(x, y) over the other two axes with column-to-
     column slope <= 1 index step.
  2. Extract a K=5-layer slab around floor(z*) per column
     (take_along_axis). Every voxel with positive plane-box intersection
     area lies inside the window: area > 0 implies
     |t| < (wx+wy+wz)/2 <= 3*wz/2, i.e. |z - z*| <= 1.5 cells.
  3. Flood the section's connected component IN SLAB SPACE: directional
     column sweeps (+-x, +-y) whose neighbor propagation re-aligns the
     K-window by the inter-column base offset delta = zb - zb', dilated
     +-1 in true z — exactly 26-connectivity of the underlying voxels.
  4. Sum per-cell closed-form areas (ops.xsarea.box_plane_area) over the
     kept component; face-contact bits from true-coordinate boundaries.

Results are bit-identical to the dense 3D kernel (tests/test_xsslab.py);
work per query drops from O(volume x rounds) to O(plane x rounds).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .xsarea import box_plane_area

K = 5


def _shift_rows(a, dy, fill):
    """Shift along axis 0 of (Y, ...): out[y] = a[y + dy]."""
    if dy == 0:
        return a
    pad = jnp.full((1,) + a.shape[1:], fill, dtype=a.dtype)
    if dy > 0:
        return jnp.concatenate([a[dy:], pad], axis=0)
    return jnp.concatenate([pad, a[:-1]], axis=0)


def _shift_k(a, dk):
    """Shift along the last (K) axis, zero fill."""
    if dk == 0:
        return a
    pad = jnp.zeros(a.shape[:-1] + (1,), dtype=a.dtype)
    if dk > 0:
        return jnp.concatenate([a[..., dk:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :-1]], axis=-1)


def _align_prev(pm, delta):
    """Previous column's K-window mask re-based into the current column's
    frame: aligned[y, k] = pm[y, k + delta[y]] (out-of-window -> False),
    then dilated +-1 in k (true-z adjacency)."""
    Kk = pm.shape[-1]
    ks = jnp.arange(Kk, dtype=jnp.int32)[None, :] + delta[:, None]
    inrange = (ks >= 0) & (ks < Kk)
    aligned = jnp.take_along_axis(pm, jnp.clip(ks, 0, Kk - 1), axis=1)
    aligned = aligned & inrange
    return aligned | _shift_k(aligned, 1) | _shift_k(aligned, -1)


def _column_dilate(reached, sec):
    """Saturate in-column (true z) connectivity."""
    for _ in range(K - 1):
        reached = reached | (
            sec & (_shift_k(reached, 1) | _shift_k(reached, -1)))
    return reached


def _sweep_x(reached, sec, zb, reverse: bool):
    """One directional column sweep along axis 0 of (X, Y, K) slabs."""
    BIG = jnp.int32(10 ** 8)

    if reverse:
        reached, sec, zb = reached[::-1], sec[::-1], zb[::-1]

    def step(carry, x):
        pm, pzb = carry
        rc, sc, czb = x
        cand = jnp.zeros_like(rc)
        for dy in (-1, 0, 1):
            pmd = _shift_rows(pm, dy, False)
            pzbd = _shift_rows(pzb, dy, BIG)
            cand = cand | _align_prev(pmd, czb - pzbd)
        new = _column_dilate(rc | (sc & cand), sc)
        return (new, czb), new

    r0 = _column_dilate(reached[0], sec[0])
    (_, _), rest = jax.lax.scan(step, (r0, zb[0]),
                                (reached[1:], sec[1:], zb[1:]))
    out = jnp.concatenate([r0[None], rest], axis=0)
    if reverse:
        out = out[::-1]
    return out


def _flood_slab(seed, sec, zb, rounds: int):
    """Bounded slab flood with a convergence flag (static trip count +
    final check round, house convention)."""

    def one_round(r):
        r = _sweep_x(r, sec, zb, False)
        r = _sweep_x(r, sec, zb, True)
        rt = jnp.swapaxes(r, 0, 1)
        st = jnp.swapaxes(sec, 0, 1)
        zt = jnp.swapaxes(zb, 0, 1)
        rt = _sweep_x(rt, st, zt, False)
        rt = _sweep_x(rt, st, zt, True)
        return jnp.swapaxes(rt, 0, 1)

    def body(carry, _):
        r, _ = carry
        nr = one_round(r)
        return (nr, jnp.any(nr != r)), None

    (r, changed), _ = jax.lax.scan(
        body, (seed & sec, jnp.bool_(True)), None, length=int(rounds) + 1)
    return r, ~changed


@functools.partial(jax.jit, static_argnames=("anisotropy", "rounds"))
def slab_sections_batch(fg, verts, normals, true_shape,
                        anisotropy: Tuple[float, float, float],
                        rounds: int = 6):
    """Batched slab cross sections with the dominant axis LAST.

    fg: (X, Y, Z) bool, padded with False beyond true_shape (3,) int32.
    verts: (B, 3) int32 (same axis order); normals: (B, 3) f32 unit
    normals (physical, same axis order); anisotropy likewise permuted.
    Every query must satisfy |n_z|*s_z = max_a |n_a|*s_a (host grouping).
    Returns (areas (B,), contacts (B,) uint8 in xxyyzz *permuted-axis*
    order — caller remaps bits to the original axis order, conv (B,)).
    """
    s = np.asarray(anisotropy, dtype=np.float32)
    X, Y, Z = fg.shape
    xs_ = jax.lax.broadcasted_iota(jnp.float32, (X, Y), 0)
    ys_ = jax.lax.broadcasted_iota(jnp.float32, (X, Y), 1)

    def one(vert, normal):
        p0 = vert.astype(jnp.float32) * s
        nx, ny, nz = normal[0], normal[1], normal[2]
        # signed plane offset of the column at z=0:
        #   t(x, y, z) = a(x, y) + z * nz * s2
        a = (xs_ * s[0] - p0[0]) * nx + (ys_ * s[1] - p0[1]) * ny \
            - p0[2] * nz
        denom = nz * s[2]
        safe = jnp.where(jnp.abs(denom) < 1e-20,
                         jnp.float32(1e-20), denom)
        zstar = -a / safe
        zb = jnp.floor(zstar).astype(jnp.int32) - (K // 2)
        zidx = zb[:, :, None] + jnp.arange(K, dtype=jnp.int32)
        valid = (zidx >= 0) & (zidx < true_shape[2])
        cell_fg = jnp.take_along_axis(
            fg, jnp.clip(zidx, 0, Z - 1), axis=2) & valid

        t = a[:, :, None] + zidx.astype(jnp.float32) * denom
        areas = box_plane_area(t, normal, anisotropy)
        sec = cell_fg & (areas > 0.0)

        kseed = vert[2] - zb[vert[0], vert[1]]
        seed = jnp.zeros((X, Y, K), dtype=bool)
        seed = seed.at[vert[0], vert[1], jnp.clip(kseed, 0, K - 1)].set(
            (kseed >= 0) & (kseed < K))

        kept, conv = _flood_slab(seed, sec, zb, rounds)
        area = jnp.sum(jnp.where(kept, areas, 0.0))

        contact = jnp.uint8(0)
        kx = jnp.any(kept, axis=(1, 2))
        ky = jnp.any(kept, axis=(0, 2))
        contact |= kx[0].astype(jnp.uint8) << 0
        contact |= kx[true_shape[0] - 1].astype(jnp.uint8) << 1
        contact |= ky[0].astype(jnp.uint8) << 2
        contact |= ky[true_shape[1] - 1].astype(jnp.uint8) << 3
        zlo = jnp.any(kept & (zidx == 0))
        zhi = jnp.any(kept & (zidx == true_shape[2] - 1))
        contact |= zlo.astype(jnp.uint8) << 4
        contact |= zhi.astype(jnp.uint8) << 5
        return area, contact, conv

    return jax.vmap(one)(verts, normals)
