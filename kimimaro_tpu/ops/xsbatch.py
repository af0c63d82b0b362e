"""Cross-label batched windowed cross sections over the FULL label volume.

The per-label driver (ops.xsarea.cross_section_areas) crops, pads,
transposes and rung-ladders each label separately, so its wall time is
dominated by per-label dispatch latency and by escalation re-runs
(BENCH_r04: 73% of rung-0 queries escalated, 5.3 ms/vertex measured on a
single skeleton vs the reference's ~2.5 ms/vertex on an Apple M3,
reference kimimaro/utility.py:226-229).

This module batches sectioning-plane queries from MANY labels into shared
device dispatches against the volume uploaded ONCE:

  1. The label volume uploads ONCE and keeps one permuted device copy per
     dominant-axis group (dominant axis stride-1, built by on-device
     transpose): each K-cell column then loads with a single contiguous
     gather instead of K random HBM accesses (random gathers are the
     measured cost of the window kernel). No per-label crop, no padding.
  2. Each lane gathers a W x W x K window around its own vertex and masks
     foreground by comparing gathered labels to ITS OWN label id — lanes
     from different labels coexist in one dispatch.
  3. Window size is chosen PER QUERY from the skeleton radius at that
     vertex (the radius ~ DBF is a sharp a-priori bound on section
     extent), so the common thin-neurite case rides a tiny W=32
     elementwise-dilation flood and only soma-scale sections climb to the
     directed-sweep rungs. Unconverged lanes escalate to the next rung.
  4. Contact bits are tested against the VOLUME faces, which matches the
     reference semantics exactly: shape_iterator grows each label bbox by
     1 before cropping (reference utility.py:114-166), so a section can
     only ever touch a crop face where that face IS a volume face.

The flood/bit-plane machinery is shared with ops.xsslab (same K-cell
column encoding, same sweep kernel); results are bit-identical to the
per-label path (tests/test_xsbatch.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .xsarea import box_plane_area
from .xsslab import K, _kdilate, _shift2, _sweep_rounds, _var_shift

_PERMS = ((1, 2, 0), (0, 2, 1), (0, 1, 2))  # dominant axis moved last
# kernel-layout permutations: window rows x, DOMINANT axis, window cols y
# (ops.xsfetch stores the dominant axis on the sublane dim so its z loop
# never indexes the lane dim dynamically)
_KPERMS = tuple((p[0], p[2], p[1]) for p in _PERMS)


def _finish_section(cell_fg, gx, gy, zb, zidx, a, denom, vert,
                    wx0, wy0, normal, anisotropy, tx, ty, tz,
                    Wx, Wy, method: str, rounds: int):
    """Steps shared by the gather and DMA-fetch paths: per-cell areas,
    seeded flood over the window, escape test, area sum, contact bits.
    `cell_fg` already includes z-validity."""
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
                    al = _var_shift(rs, zbs - zb)
                    nxt = nxt | _kdilate(al)
            nxt = nxt & secb
            return (nxt, jnp.any(nxt != r)), None

        (kept, changed), _ = jax.lax.scan(
            body, (seed, jnp.bool_(True)), None, length=int(rounds) + 1)

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
    contact |= jnp.any(
        kmask & (gx == 0)[:, :, None]).astype(jnp.uint8) << 0
    contact |= jnp.any(
        kmask & (gx == tx - 1)[:, :, None]).astype(jnp.uint8) << 1
    contact |= jnp.any(
        kmask & (gy == 0)[:, :, None]).astype(jnp.uint8) << 2
    contact |= jnp.any(
        kmask & (gy == ty - 1)[:, :, None]).astype(jnp.uint8) << 3
    contact |= jnp.any(kmask & (zidx == 0)).astype(jnp.uint8) << 4
    contact |= jnp.any(kmask & (zidx == tz - 1)).astype(jnp.uint8) << 5
    return area, contact, conv


@functools.partial(
    jax.jit,
    static_argnames=("dims", "strides", "anisotropy", "W", "rounds",
                     "method"))
def slab_sections_volume(vol_flat, qlabels, verts, normals,
                         dims: Tuple[int, int, int],
                         strides: Tuple[int, int, int],
                         anisotropy: Tuple[float, float, float],
                         W: int = 32, rounds: int = 36,
                         method: str = "dilate"):
    """Windowed cross sections of a multi-label volume, many labels per
    batch, dominant axis LAST via `strides`.

    vol_flat: (X*Y*Z,) int32 volume; `dims` are the PERMUTED extents
    (tx, ty, tz) and `strides` the flat strides of the permuted axes
    (callers pass a permuted contiguous copy, so stz == 1 and the K-cell
    columns ride one contiguous gather each; stz != 1 falls back to
    element gathers). qlabels: (B,) int32 per-lane label id. verts (B, 3)
    int32 / normals (B, 3) f32 in the SAME permuted order; anisotropy
    likewise. Every lane must satisfy |n_z|*s_z = max_a |n_a|*s_a.

    Returns (areas (B,), contacts (B,) uint8 in permuted xxyyzz bit order,
    conv (B,) bool). Identical section semantics to
    ops.xsslab.slab_sections_batch (which see)."""
    s = np.asarray(anisotropy, dtype=np.float32)
    tx, ty, tz = dims
    stx, sty, stz = strides
    Wx = int(min(W, tx))
    Wy = int(min(W, ty))
    iw = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wy), 0)
    jw = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wy), 1)

    def one(label, vert, normal):
        wx0 = jnp.clip(vert[0] - Wx // 2, 0, max(tx - Wx, 0))
        wy0 = jnp.clip(vert[1] - Wy // 2, 0, max(ty - Wy, 0))
        gx = wx0 + iw
        gy = wy0 + jw

        p0 = vert.astype(jnp.float32) * s
        nx, ny, nz = normal[0], normal[1], normal[2]
        a = ((gx.astype(jnp.float32) * s[0] - p0[0]) * nx
             + (gy.astype(jnp.float32) * s[1] - p0[1]) * ny
             - p0[2] * nz)
        denom = nz * s[2]
        safe = jnp.where(jnp.abs(denom) < 1e-20, jnp.float32(1e-20), denom)
        zb = jnp.floor(-a / safe).astype(jnp.int32) - (K // 2)

        zidx = zb[:, :, None] + jnp.arange(K, dtype=jnp.int32)
        zvalid = (zidx >= 0) & (zidx < tz)
        # callers pass a permuted contiguous copy (stz == 1), so each
        # cell column's K gathers hit CONSECUTIVE flat addresses — the
        # element gathers ride one cache line instead of K random HBM
        # accesses. (A vmapped dynamic_slice "one contiguous gather per
        # column" variant was tried on the v5e and is ~10x SLOWER than
        # element gathers at these shapes, besides crashing the axon
        # worker at the W=512 rung — gather with many tiny slices is the
        # wrong primitive on this backend.)
        flat_idx = (gx[:, :, None] * stx + gy[:, :, None] * sty
                    + jnp.clip(zidx, 0, tz - 1) * stz)
        cell_fg = (jnp.take(vol_flat, flat_idx) == label) & zvalid

        return _finish_section(
            cell_fg, gx, gy, zb, zidx, a, denom, vert, wx0, wy0, normal,
            anisotropy, tx, ty, tz, Wx, Wy, method, rounds)

    return jax.vmap(one)(qlabels, verts, normals)


@functools.partial(
    jax.jit,
    static_argnames=("kdims", "anisotropy", "Wx", "Wyf", "rounds",
                     "method"))
def slab_sections_volume_dma(volk, qlabels, verts, normals,
                             kdims: Tuple[int, int, int],
                             anisotropy: Tuple[float, float, float],
                             Wx: int, Wyf: int, rounds: int, method: str):
    """slab_sections_volume's DMA-fetch twin: the window foreground comes
    from the ops.xsfetch Pallas kernel (tiled DMA block copies) instead of
    a W*W*K element gather, and the window is (Wx, Wyf) with a
    128-ALIGNED y start (xsfetch.usable gates eligibility). The wider
    aligned window changes which rung a section converges at, never a
    converged section's area/contacts (escalation covers the rest), so
    results match the gather path per query once converged."""
    from . import xsfetch

    s = np.asarray(anisotropy, dtype=np.float32)
    tx, tz, ty = (int(v) for v in kdims)
    iw = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wyf), 0)
    jw = jax.lax.broadcasted_iota(jnp.int32, (Wx, Wyf), 1)

    def pre(label, vert, normal):
        wx0 = jnp.clip(vert[0] - Wx // 2, 0, max(tx - Wx, 0))
        wy0 = (jnp.clip(vert[1] - Wyf // 2, 0, max(ty - Wyf, 0))
               // 128) * 128
        gx = wx0 + iw
        gy = wy0 + jw
        p0 = vert.astype(jnp.float32) * s
        nx, ny, nz = normal[0], normal[1], normal[2]
        a = ((gx.astype(jnp.float32) * s[0] - p0[0]) * nx
             + (gy.astype(jnp.float32) * s[1] - p0[1]) * ny
             - p0[2] * nz)
        denom = nz * s[2]
        safe = jnp.where(jnp.abs(denom) < 1e-20, jnp.float32(1e-20), denom)
        zb = jnp.floor(-a / safe).astype(jnp.int32) - (K // 2)
        return wx0, wy0, zb, a, denom, gx, gy

    wx0, wy0, zb, a, denom, gx, gy = jax.vmap(pre)(qlabels, verts, normals)
    raw = xsfetch.fetch_secb(volk, zb, wx0, wy0, qlabels, kdims, Wx, Wyf)

    def post(label, vert, normal, wx0, wy0, zb, a, denom, gx, gy, raw_b):
        zidx = zb[:, :, None] + jnp.arange(K, dtype=jnp.int32)
        zvalid = (zidx >= 0) & (zidx < tz)
        bits = (raw_b[:, :, None]
                >> jnp.arange(K, dtype=jnp.int32)) & jnp.int32(1)
        cell_fg = (bits != 0) & zvalid
        return _finish_section(
            cell_fg, gx, gy, zb, zidx, a, denom, vert, wx0, wy0, normal,
            anisotropy, tx, ty, tz, Wx, Wyf, method, rounds)

    return jax.vmap(post)(qlabels, verts, normals, wx0, wy0, zb, a,
                          denom, gx, gy, raw)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "strides", "anisotropy", "W", "rounds",
                     "method", "chunk", "S"))
def slab_sections_super(vol_flat, ql_all, v_all, m_all, off,
                        dims: Tuple[int, int, int],
                        strides: Tuple[int, int, int],
                        anisotropy: Tuple[float, float, float],
                        W: int, rounds: int, method: str,
                        chunk: int, S: int):
    """chunk*S lanes of slab_sections_volume per dispatch, sliced at `off`
    from whole-rung query arrays ALREADY on device.

    The per-batch form paid one h2d argument upload (a tunnel round trip)
    per `lanes`-sized batch — measured 93 s for 479 batches on the dense
    benchmark's rung 1, ~15x the device compute. Here the caller uploads
    each rung's queries once and every dispatch dynamic-slices its lanes
    on device; a lane-chunked lax.scan keeps the materialized windows at
    the same `chunk` footprint as before. Results are bit-identical to
    slab_sections_volume lane for lane."""
    n = chunk * S
    ql = jax.lax.dynamic_slice(ql_all, (off,), (n,))
    v = jax.lax.dynamic_slice(v_all, (off, 0), (n, 3))
    m = jax.lax.dynamic_slice(m_all, (off, 0), (n, 3))

    def body(_, x):
        qlc, vc, mc = x
        return None, slab_sections_volume(
            vol_flat, qlc, vc, mc, dims, strides, anisotropy,
            W=W, rounds=rounds, method=method)

    _, (a, c, cv) = jax.lax.scan(
        body, None,
        (ql.reshape(S, chunk), v.reshape(S, chunk, 3),
         m.reshape(S, chunk, 3)))
    return a.reshape(-1), c.reshape(-1), cv.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("kdims", "anisotropy", "Wx", "Wyf", "rounds",
                     "method", "chunk", "S"))
def slab_sections_super_dma(volk, ql_all, v_all, m_all, off,
                            kdims: Tuple[int, int, int],
                            anisotropy: Tuple[float, float, float],
                            Wx: int, Wyf: int, rounds: int, method: str,
                            chunk: int, S: int):
    """slab_sections_super over the DMA-fetch path (see
    slab_sections_volume_dma); same on-device lane slicing contract."""
    n = chunk * S
    ql = jax.lax.dynamic_slice(ql_all, (off,), (n,))
    v = jax.lax.dynamic_slice(v_all, (off, 0), (n, 3))
    m = jax.lax.dynamic_slice(m_all, (off, 0), (n, 3))

    def body(_, x):
        qlc, vc, mc = x
        return None, slab_sections_volume_dma(
            volk, qlc, vc, mc, kdims, anisotropy,
            Wx=Wx, Wyf=Wyf, rounds=rounds, method=method)

    _, (a, c, cv) = jax.lax.scan(
        body, None,
        (ql.reshape(S, chunk), v.reshape(S, chunk, 3),
         m.reshape(S, chunk, 3)))
    return a.reshape(-1), c.reshape(-1), cv.reshape(-1)


def _as_int32_volume(all_labels) -> Optional[np.ndarray]:
    """Reinterpret/convert the label volume to int32 for device equality
    tests, or None when ids can't be represented losslessly."""
    all_labels = np.asarray(all_labels)
    if all_labels.ndim != 3:
        return None
    if all_labels.dtype == bool:
        return np.ascontiguousarray(all_labels).astype(np.int32)
    if all_labels.dtype.kind not in "ui":
        return None
    if all_labels.dtype.itemsize == 4:
        # bit-pattern equality: uint32 ids >= 2^31 survive a view
        return np.ascontiguousarray(all_labels).view(np.int32)
    if all_labels.dtype.itemsize < 4:
        conv = np.int32 if all_labels.dtype.kind == "i" else np.uint32
        return np.ascontiguousarray(all_labels.astype(conv)).view(np.int32)
    mx = int(all_labels.max()) if all_labels.size else 0
    mn = int(all_labels.min()) if all_labels.size else 0
    if mn < 0 or mx >= 2 ** 32:
        return None
    return np.ascontiguousarray(
        all_labels.astype(np.uint32)).view(np.int32)


def _label_to_i32(label: int) -> np.int32:
    """Label id under the same bit-pattern reinterpretation."""
    return np.uint64(label).astype(np.uint32).view(np.int32)


# (W, rounds, method, lane width) rung menu; rung 0 is radius-gated
_RUNGS = (
    (32, 36, "dilate", 512),
    (64, 6, "sweep", 256),
    (128, 6, "sweep", 128),
    (512, 24, "sweep", 16),
    (512, 96, "sweep", 16),
)


def cross_section_areas_volume(
    all_labels,
    verts,
    normals,
    labels_q,
    anisotropy: Sequence[float] = (1, 1, 1),
    radii: Optional[np.ndarray] = None,
):
    """Evaluate sectioning planes drawn from MANY labels of one volume.

    all_labels: (X, Y, Z) integer volume. verts (N, 3) int global voxel
    coords, normals (N, 3) unit physical normals, labels_q (N,) the label
    each query sections, radii (N,) optional physical radius hints (used
    to pick the starting window; -1/None = unknown). Returns
    (areas (N,) f32, contacts (N,) uint8) or None when the volume dtype
    can't ride the device equality test (caller falls back to the
    per-label path)."""
    import time as _time

    from ..utils import profiling

    vol = _as_int32_volume(all_labels)
    if vol is None:
        return None
    X, Y, Z = vol.shape
    n = int(np.asarray(verts).shape[0])
    areas = np.zeros(n, dtype=np.float32)
    contacts = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return areas, contacts

    verts = np.asarray(verts, dtype=np.int32).reshape(-1, 3)
    normals = np.asarray(normals, dtype=np.float32).reshape(-1, 3)
    qlab = np.asarray(
        [_label_to_i32(int(l)) for l in np.asarray(labels_q).reshape(-1)],
        dtype=np.int32)
    anis = np.asarray(anisotropy, dtype=np.float32)

    t0 = _time.perf_counter()
    vol_dev = jnp.asarray(vol)
    # one permuted COPY per dominant-axis group actually dispatched:
    # gather path z-last flat; DMA path (x, z, y) (ops.xsfetch layout).
    # Extra volume copies are cheap (537 MB each at 512^3) next to the
    # measured per-element gather cost they avoid.
    _vol_cache = {}

    def vol_for(d):
        if ("g", d) not in _vol_cache:
            _vol_cache[("g", d)] = jnp.transpose(
                vol_dev, _PERMS[d]).reshape(-1)
        return _vol_cache[("g", d)]

    def volk_for(d):
        if ("k", d) not in _vol_cache:
            _vol_cache[("k", d)] = jnp.transpose(vol_dev, _KPERMS[d])
        return _vol_cache[("k", d)]

    profiling.count("xsb_upload_ms",
                    int(1000 * (_time.perf_counter() - t0)))

    w = np.abs(normals) * anis[None, :]
    dom = np.argmax(w, axis=1)
    # a degenerate (zero) normal intersects nothing: box_plane_area is 0
    # everywhere, so the per-label path returns area 0 / contact 0 — mark
    # those lanes converged with zeros instead of dispatching them
    degenerate = w.max(axis=1) < 1e-12

    if radii is None:
        r_vox = np.full(n, np.inf, dtype=np.float32)
    else:
        radii = np.asarray(radii, dtype=np.float32).reshape(-1)
        s_min = float(anis.min())
        r_vox = np.where(radii >= 0, radii / max(s_min, 1e-9), np.inf)

    # starting rung per query: the smallest window that plausibly holds
    # the section (radius hint 2r+10), capped at the first full-extent
    # rung; unconverged/escaped lanes escalate to the next rung
    need = 2.0 * r_vox + 10.0
    first_full = next(i for i, (w, _, _, _) in enumerate(_RUNGS)
                      if w >= 512)
    start = np.full(n, first_full, dtype=np.int64)
    for r in range(first_full - 1, -1, -1):
        start = np.where(need <= _RUNGS[r][0], r, start)

    conv = degenerate.copy()

    def dims_strides(d):
        perm = _PERMS[d]
        dims = tuple(int(vol.shape[p]) for p in perm)
        # strides of the PERMUTED COPY (dominant axis contiguous)
        return dims, (dims[1] * dims[2], dims[2], 1)

    import os

    from . import xsfetch

    S_MAX = int(os.environ.get("KIMIMARO_TPU_XSB_SUPER", "32"))
    # DMA-fetch windows (ops.xsfetch): auto = on TPU where eligible;
    # 1 forces it (CPU tests run the kernel in interpret mode); 0 = off
    dma_env = os.environ.get("KIMIMARO_TPU_XSB_DMA", "auto")
    dma_on = (dma_env not in ("0", "off")
              and (dma_env == "1" or xsfetch.available()))

    def _dma_plan(d, W):
        """(kdims, Wx, Wyf) when the DMA path can serve this axis group's
        W-windows, else None."""
        dims, _ = dims_strides(d)
        tx, ty, _tz = dims
        kdims = (dims[0], dims[2], dims[1])
        Wx = int(min(W, tx))
        Wy = int(min(W, ty))
        Wyf = min(max(256, _ceil_to_128(Wy + 128)), (ty // 128) * 128)
        if xsfetch.usable(kdims, Wx, Wyf):
            return kdims, Wx, Wyf
        return None

    def _ceil_to_128(x: int) -> int:
        return -(-int(x) // 128) * 128

    def _pow2ge(x: int) -> int:
        return 1 << max(int(x) - 1, 0).bit_length()

    for r, (W, rounds, method, lanes) in enumerate(_RUNGS):
        todo = np.flatnonzero(~conv & (start <= r))
        if len(todo) == 0:
            continue
        t0 = _time.perf_counter()
        # phase 1: per axis group, upload the rung's queries ONCE and
        # dispatch chunk-scanned super-batches that slice lanes on device
        # (the per-batch form paid one tunnel round trip of argument
        # uploads per `lanes` queries — the measured rung cost was ~15x
        # device compute)
        pend = []
        for d in range(3):
            sel = todo[dom[todo] == d]
            if len(sel) == 0:
                continue
            dims, strides = dims_strides(d)
            perm = _PERMS[d]
            anis_p = tuple(float(anis[p]) for p in perm)

            # dispatch plan: S_MAX-chunk super-batches, pow2-sized tail
            # (bounded compile keys per (rung, axis))
            nch = -(-len(sel) // lanes)
            plan = []
            i = 0
            while i < nch:
                Sd = S_MAX if nch - i >= S_MAX else _pow2ge(nch - i)
                plan.append((i, Sd))
                i += Sd
            total = (plan[-1][0] + plan[-1][1]) * lanes

            padn = total - len(sel)
            vperm = np.concatenate(
                [verts[sel][:, perm],
                 np.zeros((padn, 3), np.int32)]).astype(np.int32)
            nperm = np.concatenate(
                [normals[sel][:, perm],
                 np.tile(np.float32([[0.0, 0.0, 1.0]]), (padn, 1))]
            ).astype(np.float32)
            ql = np.concatenate([qlab[sel], np.zeros(padn, np.int32)])
            ql_d = jnp.asarray(ql)
            v_d = jnp.asarray(vperm)
            m_d = jnp.asarray(nperm)

            dp = _dma_plan(d, W) if dma_on else None
            if dp is not None:
                profiling.count(f"xsb_dma_rung{r}", len(sel))
            for (c0, Sd) in plan:
                if dp is not None:
                    kdims, Wxd, Wyfd = dp
                    out = slab_sections_super_dma(
                        volk_for(d), ql_d, v_d, m_d, c0 * lanes,
                        kdims, anis_p,
                        Wx=Wxd, Wyf=Wyfd, rounds=rounds, method=method,
                        chunk=lanes, S=Sd)
                else:
                    out = slab_sections_super(
                        vol_for(d), ql_d, v_d, m_d, c0 * lanes,
                        dims, strides, anis_p,
                        W=W, rounds=rounds, method=method,
                        chunk=lanes, S=Sd)
                lo = c0 * lanes
                idx = sel[lo: lo + Sd * lanes]
                pend.append((idx, d, out))
        # phase 2: land
        fetched = jax.device_get([out for _, _, out in pend])
        for (idx, d, _), (pa, pc, pv) in zip(pend, fetched):
            take = len(idx)
            areas[idx] = np.asarray(pa)[:take]
            conv[idx] = np.asarray(pv)[:take]
            # remap permuted contact bit pairs back to original axes
            perm = _PERMS[d]
            pc = np.asarray(pc)[:take]
            cc = np.zeros_like(pc)
            for j, p in enumerate(perm):
                cc |= ((pc >> (2 * j)) & 3) << (2 * p)
            contacts[idx] = cc
        profiling.count(f"xsb_rung{r}_queries", len(todo))
        profiling.count(f"xsb_rung{r}_ms",
                        int(1000 * (_time.perf_counter() - t0)))

    leftovers = int((~conv).sum())
    if leftovers:
        profiling.count("xsb_unconverged", leftovers)
    return areas, contacts
