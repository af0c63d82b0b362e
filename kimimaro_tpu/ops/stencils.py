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


# cc3d voxel_connectivity_graph bit conventions (reference
# dijkstra_invalidation.hpp:150-191; cc3d_graphs.hpp): bit k set at voxel v
# permits movement FROM v along GRAPH_BITS' offset k.
GRAPH_BITS = {
    (1, 0, 0): 0, (-1, 0, 0): 1, (0, 1, 0): 2, (0, -1, 0): 3,
    (0, 0, 1): 4, (0, 0, -1): 5,
    (1, 1, 0): 6, (-1, 1, 0): 7, (1, -1, 0): 8, (-1, -1, 0): 9,
    (1, 0, 1): 10, (-1, 0, 1): 11, (0, 1, 1): 12, (0, -1, 1): 13,
    (1, 0, -1): 14, (-1, 0, -1): 15, (0, 1, -1): 16, (0, -1, -1): 17,
    (1, 1, 1): 18, (-1, 1, 1): 19, (1, -1, 1): 20, (-1, -1, 1): 21,
    (1, 1, -1): 22, (-1, 1, -1): 23, (1, -1, -1): 24, (-1, -1, -1): 25,
}


def graph_allows(voxel_graph, offset: Sequence[int]) -> jnp.ndarray:
    """Bool volume: may a walker leave each voxel along `offset`?"""
    bit = GRAPH_BITS[tuple(int(o) for o in offset)]
    return (voxel_graph >> bit) & 1 > 0


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
