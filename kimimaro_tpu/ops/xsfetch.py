"""Pallas TPU kernel: windowed slab foreground fetch for cross sections.

The batched cross-section kernel (ops.xsbatch) needs, per query lane, the
K-cell foreground bits of a W x W window: bit k at window cell (i, j) is
[vol[wx0+i, wy0+j, zb(i,j)+k] == label]. The XLA form is a W*W*K element
gather — measured 50-70 ns per ELEMENT on the v5e (TPU gathers are
per-element scalar-unit work; reference cost model: xs3d evaluates the
same cells at ~2.5 ms/vertex on an Apple M3, kimimaro/utility.py:226-229).
At W=512 that is 33 ms per query; the dense benchmark spends ~85 s of its
94 s cross-section pass inside these gathers.

This kernel replaces the gathers with tiled DMA block copies at HBM
bandwidth:

  * the volume is stored (x, z, y) — window rows x major, dominant axis z
    on the SUBLANE dim, window columns y on the LANE dim;
  * the window's y placement is 128-aligned BY CONSTRUCTION (the caller
    widens the window to a 128-multiple span >= 256 and aligns its start;
    window semantics — escape tests, flood, contacts — simply use the
    wider window, which changes no converged area), so every DMA start is
    provably tile-aligned and no dynamic lane shifts exist anywhere;
  * per (16, 128)-cell tile, one DMA fetches a (16, ZT=160, 128) box: the
    z-span of a tile's slab is bounded by the dominant-axis condition
    (|dz/dx|, |dz/dy| <= 1, reference xs3d cross-section geometry), so
    ZT = 16 + 128 + K + jitter rounded to the sublane tile;
  * the z loop runs as 8-step chunks, each chunk gated by pl.when on the
    tile's actual [zlo, zhi) span — flat sections touch 1-2 chunks, and
    every box index is static so Mosaic never sees a dynamic sublane
    slice;
  * tiles double-buffer: tile t+1's DMA is issued before tile t's bits
    are accumulated (same pattern as ops.pallas_argmax).

Output: per-lane (Wx, Wyf) int32 bit-planes, bit k = raw label match of
cell k (the caller ANDs z-validity and cell-area masks and runs the
existing flood — results equal ops.xsslab's per-label path lane for lane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xsslab import K

INTERPRET = False  # set True for CPU-backed equivalence tests

TX = 16  # window rows per tile (first/major dim — unaligned starts OK)
TY = 128  # window cols per tile (lane dim — starts 128-aligned)
# z-box depth: max slab z-span of a (TX, TY) tile under the dominant-axis
# slope bound (<=1 per axis) + K cells + floor jitter + 8-align loss
ZT = -(-(TX + TY + K + 2 + 7) // 8) * 8  # = 160


def _ceil_to(a: int, b: int) -> int:
    return -(-a // b) * b


def usable(kdims, Wx: int, Wyf: int) -> bool:
    """Can the kernel serve windows (Wx, Wyf) of a (tx, tz, ty) volume?"""
    tx, tz, ty = (int(v) for v in kdims)
    return (
        Wx % TX == 0
        and Wx >= TX
        and tx >= Wx
        and Wyf % TY == 0
        and Wyf >= 256
        and ty >= Wyf
        and ty % TY == 0  # top-clip window starts stay 128-aligned
        and tz % 8 == 0  # top-clip z box starts stay sublane-aligned
        and tz >= ZT
    )


def _kernel_factory(kdims, Wx: int, Wyf: int):
    tx, tz, ty = (int(v) for v in kdims)
    nX = Wx // TX
    nY = Wyf // TY
    n_tiles = nX * nY
    NC = ZT // 8  # guarded 8-step z chunks

    def kernel(wxy_ref, lab_ref, zb_ref, vol_hbm, out_ref, box, acc, sems):
        lane = pl.program_id(0)
        wx0 = wxy_ref[lane * 2]
        wy0 = wxy_ref[lane * 2 + 1]
        lab = lab_ref[lane]

        def tile_zb(t):
            ti = t // nY
            tj = t % nY
            return zb_ref[0, pl.ds(ti * TX, TX), pl.ds(tj * TY, TY)]

        def tile_dma(slot, t, zbt):
            ti = t // nY
            tj = t % nY
            xs = wx0 + ti * TX
            ys = wy0 + tj * TY  # 128-aligned: wy0 aligned, tj*TY multiple
            zlo = jnp.min(zbt)
            z0 = (jnp.clip(zlo, 0, tz - ZT) // 8) * 8
            src = vol_hbm.at[pl.ds(xs, TX), pl.ds(z0, ZT), pl.ds(ys, TY)]
            return pltpu.make_async_copy(src, box.at[slot], sems.at[slot]), z0

        zbt0 = tile_zb(0)
        dma0, _ = tile_dma(0, 0, zbt0)
        dma0.start()

        def body(t, _):
            slot = t % 2
            ti = t // nY
            tj = t % nY
            zbt = tile_zb(t)
            zlo = jnp.min(zbt)
            zhi = jnp.max(zbt)

            @pl.when(t + 1 < n_tiles)
            def _():
                dma, _ = tile_dma((t + 1) % 2, t + 1, tile_zb(t + 1))
                dma.start()

            dma_t, z0 = tile_dma(slot, t, zbt)
            dma_t.wait()

            acc[...] = jnp.zeros((TX, TY), jnp.int32)
            zsel0 = zbt - z0  # box-frame z of each cell's bit 0
            c0 = zlo - z0  # box-frame span of this tile's slab
            c1 = zhi + K - z0
            for c in range(NC):
                @pl.when((jnp.int32(c * 8) < c1)
                         & (jnp.int32(c * 8 + 8) > c0))
                def _(c=c):
                    bits = acc[...]
                    for u in range(8):
                        z = c * 8 + u
                        slab = box[slot, :, z, :]
                        j = jnp.int32(z) - zsel0
                        ok = (slab == lab) & (j >= 0) & (j < K)
                        bit = jnp.int32(1) << jnp.clip(j, 0, 31)
                        bits = bits | jnp.where(ok, bit, 0)
                    acc[...] = bits

            out_ref[0, pl.ds(ti * TX, TX), pl.ds(tj * TY, TY)] = acc[...]
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kdims", "Wx", "Wyf", "interpret"))
def _fetch_impl(volk, zb, wxy, labels, kdims, Wx: int, Wyf: int,
                interpret: bool):
    B = labels.shape[0]
    kernel = _kernel_factory(kdims, Wx, Wyf)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Wx, Wyf), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Wx, Wyf), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TX, ZT, TY), jnp.int32),
            pltpu.VMEM((TX, TY), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((B, Wx, Wyf), jnp.int32),
        interpret=interpret,
    )(wxy.astype(jnp.int32).reshape(-1), labels.astype(jnp.int32), zb,
      volk)
    return out


def fetch_secb(volk, zb, wx0, wy0, labels, kdims, Wx: int, Wyf: int):
    """Per-lane raw foreground bit-planes of (Wx, Wyf) windows.

    volk: (tx, tz, ty) int32 volume, window rows x / dominant z / window
    cols y. zb: (B, Wx, Wyf) int32 per-cell slab base (bit k samples
    z = zb + k). wx0 (B,): window x starts (any). wy0 (B,): window y
    starts — MUST be 128-aligned and satisfy wy0 + Wyf <= ty (see
    `usable`). labels (B,) int32. Returns (B, Wx, Wyf) int32 where bit k
    of cell (i, j) = [volk[wx0+i, zb+k, wy0+j] == label]; bits whose
    z = zb + k falls outside [0, tz) are UNDEFINED — callers mask with
    their z-validity planes (ops.xsbatch does)."""
    wxy = jnp.stack([wx0.astype(jnp.int32), wy0.astype(jnp.int32)],
                    axis=-1)
    return _fetch_impl(volk, zb, wxy, labels, tuple(int(v) for v in kdims),
                       int(Wx), int(Wyf), INTERPRET)


def available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
