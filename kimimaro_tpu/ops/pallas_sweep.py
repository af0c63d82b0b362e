"""Pallas TPU kernel for the directional distance sweep.

The framework's hottest primitive is the directional plane sweep
(ops.geodesic._sweep): plane i is relaxed from plane i-1 through the nine
(dx=-1, dy, dz) offsets. The lax.scan form emits one tiny XLA op per plane
(n sequential dispatch steps dominated by fixed overhead at crop sizes).
This kernel fuses an entire sweep into ONE Pallas launch: the grid walks
planes sequentially (TPU grid order is sequential per core), carrying the
previous relaxed plane in VMEM scratch, so each step is a handful of
VPU-resident vector ops with no per-step XLA overhead.

Layout: (n, H, W) with the swept axis FIRST; callers moveaxis/flip so only
the +axis0 sweep is needed. Cost semantics match ops.geodesic._sweep:
  node mode:      new = min(cur, min_9(prev_shifted) + node_cost)
  euclidean mode: new = min(cur, min_9(prev_shifted + step_cost))
  clamp_positive: positives reset to +inf (invalidation balls)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.float32(np.inf)


def _shift2d(p, dy, dz, fill):
    """out[y, z] = p[y+dy, z+dz], edges filled."""
    if dy == 0 and dz == 0:
        return p
    H, W = p.shape
    out = p
    if dy != 0:
        pad = jnp.full((1, W), fill, dtype=p.dtype)
        if dy > 0:
            out = jnp.concatenate([out[dy:], pad], axis=0)
        else:
            out = jnp.concatenate([pad, out[:-1]], axis=0)
    if dz != 0:
        pad = jnp.full((H, 1), fill, dtype=out.dtype)
        if dz > 0:
            out = jnp.concatenate([out[:, dz:], pad], axis=1)
        else:
            out = jnp.concatenate([pad, out[:, :-1]], axis=1)
    return out


def _sweep_kernel_factory(costs9, node_mode: bool, clamp_positive: bool):
    """costs9: list of ((dy, dz), step_cost) for the 9 reaching offsets."""

    def kernel(d_ref, ok_ref, nc_ref, out_ref, prev_ref):
        i = pl.program_id(0)

        cur = d_ref[0]
        okc = ok_ref[0]
        ncc = nc_ref[0]

        def relax(prev):
            cand = jnp.full_like(cur, INF)
            for (dy, dz), c in costs9:
                s = _shift2d(prev, dy, dz, INF)
                if node_mode:
                    cand = jnp.minimum(cand, s)
                else:
                    cand = jnp.minimum(cand, s + c)
            if node_mode:
                cand = cand + ncc
            new = jnp.where(okc, jnp.minimum(cur, cand), INF)
            if clamp_positive:
                new = jnp.where(new > 0.0, INF, new)
            return new

        # plane 0 passes through unchanged (the scan's init carry in
        # ops.geodesic._sweep)
        new = jax.lax.cond(i == 0, lambda: cur, lambda: relax(prev_ref[...]))

        out_ref[0] = new
        prev_ref[...] = new

    return kernel


INTERPRET = False  # set True for CPU-backed equivalence tests


@functools.partial(
    jax.jit,
    static_argnames=("anisotropy", "node_mode", "clamp_positive"),
)
def sweep_axis0(
    d,
    ok,
    node_cost,
    anisotropy: Tuple[float, float, float],
    node_mode: bool,
    clamp_positive: bool,
):
    """One +axis0 directional sweep of a (n, H, W) volume as a single
    Pallas launch."""
    n, H, W = d.shape
    w = np.asarray(anisotropy, dtype=np.float64)

    costs9 = []
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            c = np.float32(np.sqrt((w[0]) ** 2 + (dy * w[1]) ** 2 + (dz * w[2]) ** 2))
            costs9.append(((dy, dz), c))

    kernel = _sweep_kernel_factory(costs9, node_mode, clamp_positive)

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.float32)],
        interpret=INTERPRET,
    )(d, ok, node_cost)


def _shift_lanes2d(p, dy, dz, fill):
    """out[b, y, z] = p[b, y+dy, z+dz], edges filled (batched planes)."""
    if dy == 0 and dz == 0:
        return p
    B, H, W = p.shape
    out = p
    if dy != 0:
        pad = jnp.full((B, 1, W), fill, dtype=p.dtype)
        if dy > 0:
            out = jnp.concatenate([out[:, dy:], pad], axis=1)
        else:
            out = jnp.concatenate([pad, out[:, :-1]], axis=1)
    if dz != 0:
        pad = jnp.full((B, H, 1), fill, dtype=out.dtype)
        if dz > 0:
            out = jnp.concatenate([out[:, :, dz:], pad], axis=2)
        else:
            out = jnp.concatenate([pad, out[:, :, :-1]], axis=2)
    return out


def _batched_kernel_factory(costs9, node_mode: bool, clamp_positive: bool,
                            B: int, H: int, W: int,
                            bits9: Optional[Tuple[int, ...]] = None):
    """Kernel over (B, 1, H, W) blocks: every lane's plane i relaxed from
    the carried plane i-1 in one grid step (grid walks the swept axis;
    lanes ride the block's leading dim, so batch width costs no extra
    sequential steps — the form that replaces vmapping the scan sweep).

    The carried plane lives in an INF-bordered (B, H+2, W+2) scratch so
    the nine neighbor reads are static slices of one buffer instead of
    pad+concat chains (whose temporaries blow the 16 MB scoped-vmem
    budget at useful lane counts).

    bits9 (optional): per-offset cc3d GRAPH_BITS indices. When set, a
    voxel_graph operand rides along and a candidate reaching v from
    u = v + o is admitted only when u's bitfield permits movement along
    -o (the scan form's semantics, reference
    dijkstra_invalidation.hpp:150-191). The previous plane's bitfield is
    carried in a zero-bordered scratch — border zeros read as "no
    permission", matching the scan form's False fill."""

    def relax_body(cur, okc, ncc, prev_ref, vgprev_ref):
        cand = jnp.full_like(cur, INF)
        for k, ((dy, dz), c) in enumerate(costs9):
            s = prev_ref[:, 1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
            if bits9 is not None:
                pv = vgprev_ref[:, 1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
                allowed = (pv >> jnp.uint32(bits9[k])) & jnp.uint32(1)
                s = jnp.where(allowed > 0, s, INF)
            if node_mode:
                cand = jnp.minimum(cand, s)
            else:
                cand = jnp.minimum(cand, s + c)
        if node_mode:
            cand = cand + ncc
        new = jnp.where(okc, jnp.minimum(cur, cand), INF)
        if clamp_positive:
            new = jnp.where(new > 0.0, INF, new)
        return new

    if bits9 is None:
        def kernel(d_ref, ok_ref, nc_ref, out_ref, prev_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                prev_ref[...] = jnp.full((B, H + 2, W + 2), INF, jnp.float32)

            cur = d_ref[:, 0]
            okc = ok_ref[:, 0]
            ncc = nc_ref[:, 0]
            new = jax.lax.cond(
                i == 0, lambda: cur,
                lambda: relax_body(cur, okc, ncc, prev_ref, None))
            out_ref[:, 0] = new
            prev_ref[:, 1:H + 1, 1:W + 1] = new

        return kernel

    def kernel_vg(d_ref, ok_ref, nc_ref, vg_ref, out_ref, prev_ref,
                  vgprev_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            prev_ref[...] = jnp.full((B, H + 2, W + 2), INF, jnp.float32)
            vgprev_ref[...] = jnp.zeros((B, H + 2, W + 2), jnp.uint32)

        cur = d_ref[:, 0]
        okc = ok_ref[:, 0]
        ncc = nc_ref[:, 0]
        new = jax.lax.cond(
            i == 0, lambda: cur,
            lambda: relax_body(cur, okc, ncc, prev_ref, vgprev_ref))
        out_ref[:, 0] = new
        prev_ref[:, 1:H + 1, 1:W + 1] = new
        vgprev_ref[:, 1:H + 1, 1:W + 1] = vg_ref[:, 0]

    return kernel_vg


# Scoped-vmem accounting charges the pipelined (B,1,H,W) blocks at their
# PHYSICAL tile-padded sizes (H to 8 sublanes, W to 128 lanes), times
# roughly a dozen live buffers (double-buffered ins/out + scratch + branch
# duplication), against a 16 MB limit. 128K physical plane elems per
# lane-chunk (= 0.5 MB/buffer) is the empirically safe point: Bc=8 x
# (128,128,64) compiled and ran; Bc=16 at that shape and Bc=64 x
# (64,64,32) both tripped the limit.
_CHUNK_PLANE_BUDGET = 128 * 1024


def _phys_plane_elems(H: int, W: int) -> int:
    return ((H + 7) // 8 * 8) * ((W + 127) // 128 * 128)


@functools.partial(
    jax.jit,
    static_argnames=("anisotropy", "node_mode", "clamp_positive",
                     "descending", "bits9"),
)
def sweep_axis0_batched(
    d,
    ok,
    node_cost,
    anisotropy: Tuple[float, float, float],
    node_mode: bool,
    clamp_positive: bool,
    descending: bool = False,
    vg=None,
    bits9: Optional[Tuple[int, ...]] = None,
):
    """Directional sweep along axis 1 of (B, n, H, W) volumes in ONE
    Pallas launch per lane-chunk. `descending` reverses the grid's plane
    order through the index maps — no data flips anywhere.

    vg/bits9 (optional, both or neither): per-lane cc3d voxel_graph
    bitfields (uint32, same layout as d) plus the 9 GRAPH_BITS indices for
    this layout's offsets in (dy, dz) loop order — computed by the caller
    in the ORIGINAL axis frame (they differ per swept axis and
    direction)."""
    B, n, H, W = d.shape
    w = np.asarray(anisotropy, dtype=np.float64)

    costs9 = []
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            c = np.float32(
                np.sqrt((w[0]) ** 2 + (dy * w[1]) ** 2 + (dz * w[2]) ** 2)
            )
            costs9.append(((dy, dz), c))

    has_vg = bits9 is not None
    # the vg operand adds a double-buffered input block + one scratch
    budget = _CHUNK_PLANE_BUDGET * 3 // 4 if has_vg else _CHUNK_PLANE_BUDGET
    bmax = max(1, budget // _phys_plane_elems(H, W))

    if descending:
        def imap(i):
            return (0, n - 1 - i, 0, 0)
    else:
        def imap(i):
            return (0, i, 0, 0)

    def run(db, okb, ncb, vgb):
        Bc = db.shape[0]
        kernel = _batched_kernel_factory(
            costs9, node_mode, clamp_positive, Bc, H, W,
            bits9=bits9,
        )
        spec = pl.BlockSpec((Bc, 1, H, W), imap)
        in_specs = [spec, spec, spec] + ([spec] if has_vg else [])
        scratch = [pltpu.VMEM((Bc, H + 2, W + 2), jnp.float32)]
        if has_vg:
            scratch.append(pltpu.VMEM((Bc, H + 2, W + 2), jnp.uint32))
        args = (db, okb, ncb) + ((vgb,) if has_vg else ())
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=in_specs,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Bc, n, H, W), jnp.float32),
            scratch_shapes=scratch,
            interpret=INTERPRET,
        )(*args)

    if B <= bmax:
        return run(d, ok, node_cost, vg)
    outs = []
    for s in range(0, B, bmax):
        outs.append(run(d[s:s + bmax], ok[s:s + bmax],
                        node_cost[s:s + bmax],
                        vg[s:s + bmax] if has_vg else None))
    return jnp.concatenate(outs, axis=0)


def available() -> bool:
    """Pallas TPU sweeps need a TPU backend (or interpret mode)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
