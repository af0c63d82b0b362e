"""Windowed bitplane cross sections: O(section) work per sectioning query.

The first-generation kernel (ops.xsarea._sections_batch) floods the FULL
3D crop per vertex; a scan-per-column slab variant fixed the asymptotics
on CPU but was dispatch-bound on TPU (hundreds of sequential scan steps
per flood round). xs3d's real insight is that a neurite's cross section
is tiny — O(r^2) cells — regardless of crop size
(/root/reference/kimimaro/utility.py:221-229: per-vertex cost tracks the
section, not the volume). This kernel restores that scaling TPU-natively:

  1. Pick the dominant axis d = argmax_a |n_a| * s_a (host-side; queries
     grouped per axis, volume transposed so d is LAST). The plane is a
     height field z*(x, y) over the other two axes with column-to-column
     slope <= 1 index step.
  2. Work in a W x W column window centered on the vertex. Per column,
     the K=5-layer z-window around floor(z*) holds every cell with
     positive plane-box intersection area (area > 0 implies
     |z - z*| < 1.5 cells, and the window spans +-2).
  3. Pack each column's K window cells into the low bits of ONE uint32.
     The 26-connected component flood is then a per-round elementwise
     stencil over (W, W) words: neighbor columns re-base into the current
     column's frame by an elementwise VARIABLE BIT SHIFT of the window
     base delta, +-1 fixed shifts add true-z dilation, AND with the
     section mask clips to the section. No scans, no gathers — a whole
     flood round is ~50 vector ops on W*W words.
  4. Area = sum of closed-form per-cell plane-box areas
     (ops.xsarea.box_plane_area) over kept bits; face contacts from true
     coordinates. A section that reaches the window edge (where the edge
     is not a crop face) flags non-convergence and the caller escalates
     (bigger window / more rounds / dense 3D fallback).

Bit-identical to the dense 3D kernel (tests/test_xsslab.py)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .xsarea import box_plane_area

K = 5
_KMASK = np.uint32((1 << K) - 1)


def _shift2(a, dx, dy, fill):
    """out[x, y] = a[x+dx, y+dy], edges filled (static shifts)."""
    if dx != 0:
        pad = jnp.full((1,) + a.shape[1:], fill, dtype=a.dtype)
        a = (jnp.concatenate([a[dx:], pad], axis=0) if dx > 0
             else jnp.concatenate([pad, a[:-1]], axis=0))
    if dy != 0:
        pad = jnp.full(a.shape[:-1] + (1,), fill, dtype=a.dtype)
        a = (jnp.concatenate([a[:, dy:], pad], axis=1) if dy > 0
             else jnp.concatenate([pad, a[:, :-1]], axis=1))
    return a


def _var_shift(bits, delta):
    """bits << delta with elementwise (possibly negative) delta, clamped
    to the word; shifts beyond +-31 vanish like the bits they'd drop."""
    d = jnp.clip(delta, -31, 31)
    up = jnp.left_shift(bits, jnp.maximum(d, 0).astype(jnp.uint32))
    return jnp.right_shift(up, jnp.maximum(-d, 0).astype(jnp.uint32))


def _kdilate(bits):
    return bits | (bits << jnp.uint32(1)) | (bits >> jnp.uint32(1))


def _sweep_rounds(seed, secb, zb, rounds: int):
    """Directional-sweep flood over the (W, W) bitplane words: each round
    runs 4 directed full-window sweeps (+x, -x, +y, -y as lax.scans whose
    carry is the previous column/row), so information crosses the whole
    window in ONE round and convergence takes O(section turns) rounds
    instead of O(section diameter) dilation rounds — the fat-section
    (soma / dense-Voronoi) regime where the dilation kernel drowned.
    Returns (kept, changed_in_last_round)."""
    def infill(r, sb):
        # vertical (in-word) run fill: K=5 bits need 4 adjacency passes
        for _ in range(K - 1):
            r = (r | _kdilate(r)) & sb
        return r

    def sweep(r, axis: int, reverse: bool):
        # scan along `axis`; each step pulls from the previous line's
        # three neighbor columns (dy in -1,0,1), rebased by zb delta
        rt = r.T if axis == 1 else r
        st = secb.T if axis == 1 else secb
        zt = zb.T if axis == 1 else zb
        if reverse:
            rt, st, zt = rt[::-1], st[::-1], zt[::-1]

        def step(carry, x):
            prev_r, prev_zb = carry
            cur_r, cur_sb, cur_zb = x
            cand = cur_r
            for dy in (-1, 0, 1):
                pr = _shift1(prev_r, dy)
                pz = _shift1(prev_zb, dy)
                al = _var_shift(pr, pz - cur_zb)
                cand = cand | _kdilate(al)
            new = infill(cand & cur_sb, cur_sb)
            return (new, cur_zb), new

        zero = jnp.zeros((rt.shape[1],), jnp.uint32)
        (_, _), out = jax.lax.scan(
            step, (zero, zt[0]), (rt, st, zt))
        if reverse:
            out = out[::-1]
        return out.T if axis == 1 else out

    def body(carry, _):
        r, _ = carry
        r0 = r
        for axis in (0, 1):
            for rev in (False, True):
                r = sweep(r, axis, rev)
        return (r, jnp.any(r != r0)), None

    (kept, changed), _ = jax.lax.scan(
        body, (infill(seed, secb), jnp.bool_(True)), None,
        length=int(rounds) + 1)
    return kept, changed


def _shift1(a, d):
    """1D shift with zero fill: out[i] = a[i+d]."""
    if d == 0:
        return a
    pad = jnp.zeros((1,) + a.shape[1:], dtype=a.dtype)
    return (jnp.concatenate([a[d:], pad]) if d > 0
            else jnp.concatenate([pad, a[:-1]]))


@functools.partial(
    jax.jit, static_argnames=("anisotropy", "W", "rounds", "method"))
def slab_sections_batch(fg, verts, normals, true_shape,
                        anisotropy: Tuple[float, float, float],
                        W: int = 64, rounds: int = 96,
                        method: str = "dilate"):
    """Batched windowed cross sections with the dominant axis LAST.

    fg: (X, Y, Z) bool, False-padded beyond true_shape ((3,) int32).
    verts (B, 3) int32 / normals (B, 3) f32 unit physical normals, both in
    the SAME permuted axis order; anisotropy likewise. Every query must
    satisfy |n_z|*s_z = max_a |n_a|*s_a (host grouping). Returns
    (areas (B,), contacts (B,) uint8 in permuted xxyyzz bit order — the
    caller remaps to original axes, conv (B,) bool).

    method="dilate": per-round 8-neighbor dilation (best for small
    sections at small W); "sweep": 4 directed full-window sweeps per round
    (converges in O(turns) rounds — the escalation rungs)."""
    s = np.asarray(anisotropy, dtype=np.float32)
    X, Y, Z = fg.shape
    # rectangular window: clamp per axis (a square min(W, X, Y) clamp
    # made the "full-window" escalation rung silently too small along the
    # larger axis of asymmetric crops, so wide sections could never
    # converge and every one escalated to the dense 3D rung)
    Wx = int(min(W, X))
    Wy = int(min(W, Y))
    fg_flat = fg.reshape(-1)
    iw = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wy), 0)
    jw = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wy), 1)

    def one(vert, normal):
        tx, ty, tz = true_shape[0], true_shape[1], true_shape[2]
        wx0 = jnp.clip(vert[0] - Wx // 2, 0, jnp.maximum(X - Wx, 0))
        wy0 = jnp.clip(vert[1] - Wy // 2, 0, jnp.maximum(Y - Wy, 0))
        gx = wx0 + iw  # global (crop-frame) coords of window columns
        gy = wy0 + jw

        p0 = vert.astype(jnp.float32) * s
        nx, ny, nz = normal[0], normal[1], normal[2]
        # t(x, y, z) = a(x, y) + z * nz * s2
        a = ((gx.astype(jnp.float32) * s[0] - p0[0]) * nx
             + (gy.astype(jnp.float32) * s[1] - p0[1]) * ny
             - p0[2] * nz)
        denom = nz * s[2]
        safe = jnp.where(jnp.abs(denom) < 1e-20, jnp.float32(1e-20), denom)
        zb = jnp.floor(-a / safe).astype(jnp.int32) - (K // 2)

        zidx = zb[:, :, None] + jnp.arange(K, dtype=jnp.int32)
        zvalid = (zidx >= 0) & (zidx < tz)
        flat_idx = (gx[:, :, None] * Y + gy[:, :, None]) * Z \
            + jnp.clip(zidx, 0, Z - 1)
        cell_fg = jnp.take(fg_flat, flat_idx) & zvalid

        t = a[:, :, None] + zidx.astype(jnp.float32) * denom
        areas = box_plane_area(t, normal, anisotropy)
        sec = cell_fg & (areas > 0.0)
        secb = jnp.sum(
            jnp.where(sec, jnp.uint32(1) << jnp.arange(K, dtype=jnp.uint32),
                      jnp.uint32(0)),
            axis=-1, dtype=jnp.uint32)

        si = vert[0] - wx0
        sj = vert[1] - wy0
        kseed = vert[2] - zb[si, sj]
        seedbit = jnp.where(
            (kseed >= 0) & (kseed < K),
            jnp.uint32(1) << jnp.clip(kseed, 0, K - 1).astype(jnp.uint32),
            jnp.uint32(0))
        seed = jnp.zeros((Wx, Wy), jnp.uint32).at[si, sj].set(seedbit) & secb

        if method == "sweep":
            kept, changed = _sweep_rounds(seed, secb, zb, rounds)
        else:
            def body(carry, _):
                r, _ = carry
                nxt = r | _kdilate(r)
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        rs = _shift2(r, dx, dy, jnp.uint32(0))
                        zbs = _shift2(zb, dx, dy, jnp.int32(0))
                        # neighbor bit k' sits at true z = zb_nbr + k',
                        # i.e. our k = k' + (zb_nbr - zb)
                        al = _var_shift(rs, zbs - zb)
                        nxt = nxt | _kdilate(al)
                nxt = nxt & secb
                return (nxt, jnp.any(nxt != r)), None

            (kept, changed), _ = jax.lax.scan(
                body, (seed, jnp.bool_(True)), None, length=int(rounds) + 1)

        # window edges that are NOT crop faces: reaching one means the
        # section may continue outside the window -> escalate
        esc = ((gx == wx0) & (wx0 > 0)) | \
              ((gx == wx0 + Wx - 1) & (wx0 + Wx < tx)) | \
              ((gy == wy0) & (wy0 > 0)) | \
              ((gy == wy0 + Wy - 1) & (wy0 + Wy < ty))
        escaped = jnp.any((kept != 0) & esc)
        conv = (~changed) & (~escaped)

        kbits = (kept[:, :, None]
                 >> jnp.arange(K, dtype=jnp.uint32)) & jnp.uint32(1)
        kmask = kbits != 0
        area = jnp.sum(jnp.where(kmask, areas, 0.0))

        contact = jnp.uint8(0)
        contact |= jnp.any(kmask & (gx == 0)[:, :, None]).astype(jnp.uint8) << 0
        contact |= jnp.any(kmask & (gx == tx - 1)[:, :, None]).astype(jnp.uint8) << 1
        contact |= jnp.any(kmask & (gy == 0)[:, :, None]).astype(jnp.uint8) << 2
        contact |= jnp.any(kmask & (gy == ty - 1)[:, :, None]).astype(jnp.uint8) << 3
        contact |= jnp.any(kmask & (zidx == 0)).astype(jnp.uint8) << 4
        contact |= jnp.any(kmask & (zidx == tz - 1)).astype(jnp.uint8) << 5
        return area, contact, conv

    return jax.vmap(one)(verts, normals)
