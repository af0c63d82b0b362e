"""Shared stencil utilities for voxel-grid device kernels.

The reference implements grid traversals as C++ neighborhood loops
(/root/reference/ext/skeletontricks/dijkstra_invalidation.hpp:60-191). The
TPU-native equivalents are static shifted-array stencils: every 6/18/26
neighborhood op becomes a small set of statically-unrolled shifted adds/mins
that XLA fuses into a handful of vector passes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

INF = jnp.float32(np.inf)


def neighborhood_offsets(connectivity: int = 26, ndim: int = 3) -> List[Tuple[int, ...]]:
    """Offsets for a 6/18/26 (3D) neighborhood, in a fixed deterministic
    order (lexicographic) used for tie-breaking parity everywhere."""
    assert ndim == 3
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                nnz = abs(dx) + abs(dy) + abs(dz)
                if connectivity == 6 and nnz > 1:
                    continue
                if connectivity == 18 and nnz > 2:
                    continue
                offs.append((dx, dy, dz))
    return offs


def offset_costs(
    offsets: Sequence[Tuple[int, ...]], anisotropy: Sequence[float]
) -> np.ndarray:
    """Physical (anisotropic euclidean) length of each step offset."""
    w = np.asarray(anisotropy, dtype=np.float64)
    out = np.array(
        [np.sqrt(np.sum((np.array(o) * w) ** 2)) for o in offsets],
        dtype=np.float32,
    )
    return out


def shifted(vol: jnp.ndarray, offset: Sequence[int], fill) -> jnp.ndarray:
    """out[v] = vol[v + offset], out-of-bounds filled with `fill`.

    Static offsets only: unrolls to a pad+slice XLA fuses away.
    """
    out = vol
    for axis, o in enumerate(offset):
        if o == 0:
            continue
        n = out.shape[axis]
        if abs(o) >= n:
            return jnp.full_like(vol, fill)
        pad_width = [(0, 0)] * out.ndim
        if o > 0:
            pad_width[axis] = (0, o)
            padded = jnp.pad(out, pad_width, constant_values=fill)
            idx = [slice(None)] * out.ndim
            idx[axis] = slice(o, o + n)
            out = padded[tuple(idx)]
        else:
            pad_width[axis] = (-o, 0)
            padded = jnp.pad(out, pad_width, constant_values=fill)
            idx = [slice(None)] * out.ndim
            idx[axis] = slice(0, n)
            out = padded[tuple(idx)]
    return out
