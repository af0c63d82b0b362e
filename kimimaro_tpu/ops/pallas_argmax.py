"""Pallas TPU kernel: per-label masked argmax over dynamic volume crops.

The global trace engine's per-iteration target selection (gengine:
reference kimimaro/trace.py:225-230 target = argmax of the DAF over
still-valid voxels; CachedTargetFinder ext/skeletontricks/
skeletontricks.pyx:995-1045) reduces a gather crop around every label's
bbox. The XLA form (vmapped dynamic_slice + where + argmax,
gengine._crop_argmax) materializes lane-chunked crop copies in HBM and
re-reads them for the reduce — measured ~150 ms per iteration for the
dense workload's 2048-lane 96^3 tier, ~10x off the pure-bandwidth cost
of reading each crop once.

This kernel streams each lane's crop HBM->VMEM with double-buffered
async copies and reduces in VMEM, so every crop voxel is read exactly
once:

  grid = (n_lanes,); per lane the x-extent is cut into slabs sized to
  the VMEM budget; slab s+1's DMA is issued before slab s is reduced.

Windows are widened to sublane/lane-aligned starts (8 / 128) so the DMA
engine never sees a misaligned vector start. Widening is semantics-free:
a label's voxels all lie inside its bbox <= the requested crop, so extra
columns can only hold other labels (masked out by the cc == lid test),
and the reduction returns GLOBAL coordinates, not window-relative ones.

Tie-break contract (must match jnp.argmax over the crop's ravel, which
the engines rely on for cross-engine bit-equality): the FIRST maximum in
global (x, y, z) lexicographic order. Within a slab that is the minimum
row-major index among maxima; across slabs a strictly-greater-only
update keeps the earliest slab's candidate (slab starts are
non-decreasing, so revisited voxels from the clamped last slab can never
steal a tie).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = np.float32(-np.inf)

INTERPRET = False  # set True for CPU-backed equivalence tests

# VMEM budget for the two double-buffered slab buffers (f32 field +
# cc ids), conservative against the ~16 MB scoped-vmem limit.
_SLAB_BYTES = 5 << 20


def _ceil_to(a: int, b: int) -> int:
    return -(-a // b) * b


def _window_plan(crop, vol_shape, cc_bytes: int):
    """Static (CYp, CZp, SX, n_slabs) for a crop inside vol_shape.

    A padded window tier is only usable when the axis size is itself
    tile-aligned: the aligned-down clamp `align(min(o, AXIS - Cp))` must
    stay >= AXIS - Cp or the window stops short of the axis end and drops
    rows of top-edge labels. Misaligned axes fall back to the full
    extent (start provably 0)."""
    X, Y, Z = (int(v) for v in vol_shape)
    CX, CY, CZ = (int(v) for v in crop)
    CYp = Y if (Y % 8 or _ceil_to(CY, 8) + 8 > Y) else _ceil_to(CY, 8) + 8
    CZp = Z if (Z % 128 or _ceil_to(CZ, 128) + 128 > Z) \
        else _ceil_to(CZ, 128) + 128
    # physical (padded) bytes of one slab plane in both buffers, 2 slots
    phys = (_ceil_to(CYp, 8) * _ceil_to(CZp, 128) * 4
            + _ceil_to(CYp, 32 // cc_bytes * 8) * _ceil_to(CZp, 128)
            * cc_bytes)
    sx = max(1, _SLAB_BYTES // (2 * phys))
    SX = min(CX, sx)
    n_slabs = -(-CX // SX)
    return CYp, CZp, SX, n_slabs


def _kernel_factory(CYp: int, CZp: int, SX: int, n_slabs: int,
                    vol_shape, cc_dtype):
    X, Y, Z = (int(v) for v in vol_shape)
    plane = CYp * CZp
    big = np.int32(2 ** 31 - 1)

    def kernel(offs_ref, lids_ref, f_hbm, cc_hbm, val_ref, coord_ref,
               fbuf, cbuf, sems):
        # offs/coord ride flattened (N*3,) rank-1 SMEM: a rank-2 SMEM
        # window pads the minor dim to 128 (2048x3 i32 -> 1 MB, past the
        # 1 MB SMEM budget on its own)
        lane = pl.program_id(0)
        ox = offs_ref[lane * 3]
        oy = offs_ref[lane * 3 + 1]
        oz = offs_ref[lane * 3 + 2]
        lid = lids_ref[lane]

        # align LAST so Mosaic can prove the HBM slice start's tiling
        # divisibility (it cannot see through min/max). _window_plan only
        # emits padded tiers on tile-aligned axes, so Y - CYp (Z - CZp)
        # is a multiple of the tile and the mask never undershoots the
        # clamp; full-extent tiers pin the start to a literal 0.
        # (x // t) * t, not x & ~(t-1): Mosaic's divisibility analysis
        # recognizes the muli-by-tile form but not the andi form
        if CYp == Y:
            oy0 = jnp.int32(0)
        else:
            oy0 = (jnp.maximum(jnp.minimum(oy, jnp.int32(Y - CYp)), 0)
                   // 8) * 8
        if CZp == Z:
            oz0 = jnp.int32(0)
        else:
            oz0 = (jnp.maximum(jnp.minimum(oz, jnp.int32(Z - CZp)), 0)
                   // 128) * 128

        def slab_start(s):
            return jnp.minimum(ox + s * SX, jnp.int32(X - SX))

        def dmas(slot, s):
            xs = slab_start(s)
            src = lambda ref: ref.at[pl.ds(xs, SX), pl.ds(oy0, CYp),
                                     pl.ds(oz0, CZp)]
            return (
                pltpu.make_async_copy(src(f_hbm), fbuf.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(src(cc_hbm), cbuf.at[slot],
                                      sems.at[slot, 1]),
            )

        for c in dmas(0, 0):
            c.start()

        iota = (
            jax.lax.broadcasted_iota(jnp.int32, (SX, CYp, CZp), 0) * plane
            + jax.lax.broadcasted_iota(jnp.int32, (SX, CYp, CZp), 1) * CZp
            + jax.lax.broadcasted_iota(jnp.int32, (SX, CYp, CZp), 2)
        )

        def body(s, carry):
            bv, bxs, bwidx = carry
            slot = s % 2

            @pl.when(s + 1 < n_slabs)
            def _():
                for c in dmas((s + 1) % 2, s + 1):
                    c.start()

            for c in dmas(slot, s):
                c.wait()

            # compare in i32: v5e vector compares are 32-bit lanes (a
            # u16 == u16 vector compare fails Mosaic lowering)
            vals = jnp.where(cbuf[slot].astype(jnp.int32) == lid,
                             fbuf[slot], NEG_INF)
            m = jnp.max(vals)
            widx = jnp.min(jnp.where(vals == m, iota, big))
            take = m > bv
            bv = jnp.where(take, m, bv)
            bxs = jnp.where(take, slab_start(s), bxs)
            bwidx = jnp.where(take, widx, bwidx)
            return bv, bxs, bwidx

        bv, bxs, bwidx = jax.lax.fori_loop(
            0, n_slabs, body, (NEG_INF, jnp.int32(0), jnp.int32(0)))

        lx = bwidx // plane
        r = bwidx - lx * plane
        ly = r // CZp
        lz = r - ly * CZp
        val_ref[lane] = bv
        coord_ref[lane * 3] = bxs + lx
        coord_ref[lane * 3 + 1] = oy0 + ly
        coord_ref[lane * 3 + 2] = oz0 + lz

    return kernel


def crop_argmax(packed, cc, offs, lids, crop: Tuple[int, int, int]):
    """Per-label first-max of `packed` over the label's voxels inside its
    gather crop. offs (N, 3) int32 crop origins (pre-clamped in bounds),
    lids (N,) label ids. Returns (coords (N, 3) int32 GLOBAL, val (N,)).
    Bit-identical to gengine._crop_argmax + _unflatten_crop.

    PRECONDITION: each lane's label voxels all lie inside its requested
    crop window (the engines' tier assignment guarantees bbox <= crop);
    the aligned-widened window may otherwise see voxels the XLA form
    masks out."""
    return _crop_argmax_impl(packed, cc, offs, lids, crop, INTERPRET)


@functools.partial(jax.jit, static_argnames=("crop", "interpret"))
def _crop_argmax_impl(packed, cc, offs, lids, crop: Tuple[int, int, int],
                      interpret: bool):
    N = offs.shape[0]
    vol_shape = packed.shape
    cc_bytes = cc.dtype.itemsize
    CYp, CZp, SX, n_slabs = _window_plan(crop, vol_shape, cc_bytes)
    kernel = _kernel_factory(CYp, CZp, SX, n_slabs, vol_shape, cc.dtype)

    # Plain block-free SMEM inputs, NOT PrefetchScalarGridSpec: the lane
    # tables only feed in-kernel DMA offsets (never a block index_map),
    # and each prefetched SMEM operand reserves a fixed 1 MB scoped
    # window — two of them blow the 1 MB SMEM budget outright.
    val, coord = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            # block-free SMEM outputs: each grid step scalar-writes its
            # own lane row, sidestepping the (8, 128) vector tiling rules
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SX, CYp, CZp), jnp.float32),
            pltpu.VMEM((2, SX, CYp, CZp), cc.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N * 3,), jnp.int32),
        ],
        interpret=interpret,
    )(offs.astype(jnp.int32).reshape(-1), lids.astype(jnp.int32),
      packed, cc)
    return coord.reshape(N, 3), val


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
