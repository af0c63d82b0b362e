"""Binary hole filling on device.

TPU-native replacement for the `fill_voids` C++ dependency
(/root/reference/kimimaro/trace.py:108-110, intake.py:747-794). A "hole" is
background not 6-connected (4-connected in 2D) to the volume border; filling
sets it to foreground.

Implemented as a border-seeded flood fill over the background using the
directional-sweep relaxation engine (ops.geodesic), i.e. a handful of
`lax.scan` passes instead of a serial BFS.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .geodesic import flood_fill


def fill(binimg, return_fill_count: bool = False):
    """Fill interior holes of a 3D boolean volume."""
    bin3 = jnp.asarray(binimg, dtype=bool)
    squeeze_back = False
    if bin3.ndim == 2:
        bin3 = bin3[..., None]
        squeeze_back = True
    assert bin3.ndim == 3

    bg = ~bin3
    border = jnp.zeros(bin3.shape, dtype=bool)
    # for genuinely 2D inputs the border is the 2D perimeter (matching the
    # 2D semantics of the reference's fill_voids on 2D images)
    border_axes = (0, 1) if squeeze_back else (0, 1, 2)
    for axis in border_axes:
        idx = [slice(None)] * 3
        idx[axis] = 0
        border = border.at[tuple(idx)].set(True)
        idx[axis] = bin3.shape[axis] - 1
        border = border.at[tuple(idx)].set(True)

    reached = flood_fill(border & bg, bg, connectivity=6)
    filled = bin3 | ~reached

    if squeeze_back:
        filled = filled[..., 0]
    if return_fill_count:
        n = jnp.sum(filled) - jnp.sum(bin3)
        return filled, n
    return filled
