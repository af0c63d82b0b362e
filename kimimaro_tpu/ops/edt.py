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


@functools.partial(jax.jit, static_argnames=("w", "black_border", "line_block"))
def _parabola_pass(d, labels, w: float, black_border: bool, line_block: int = 128):
    """One exact min-plus parabola pass along the LAST axis.

    d: (B, n) float32 squared distances from previous passes (BIG = inf).
    labels: (B, n) labels along the same lines.
    """
    B, n = d.shape
    jj = jnp.arange(n, dtype=jnp.float32)
    # kernel[i, j] = w^2 (i - j)^2
    kern = (np.float32(w) ** 2) * (jj[None, :] - jj[:, None]) ** 2  # (n, n)

    nb = -(-B // line_block)
    pad = nb * line_block - B
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=BIG)
    l_p = jnp.pad(labels, ((0, pad), (0, 0)), constant_values=0)
    d_p = d_p.reshape(nb, line_block, n)
    l_p = l_p.reshape(nb, line_block, n)

    def one_block(args):
        dc, lc = args  # (line_block, n)
        same = lc[:, :, None] == lc[:, None, :]  # (blk, i, j)
        g = jnp.where(same, dc[:, None, :], 0.0)  # (blk, i, j)
        return jnp.min(g + kern[None, :, :], axis=2)

    out = jax.lax.map(one_block, (d_p, l_p))
    out = out.reshape(nb * line_block, n)[:B]

    if black_border:
        ii = jnp.arange(n, dtype=jnp.float32)
        border = (np.float32(w) ** 2) * jnp.minimum(ii + 1.0, jnp.float32(n) - ii) ** 2
        out = jnp.minimum(out, border[None, :])

    return out


def edtsq(
    labels,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    black_border: bool = False,
) -> jnp.ndarray:
    """Squared multi-label anisotropic EDT. Returns float32, BIG where the
    distance is unbounded (single label, no black border)."""
    labels = jnp.asarray(labels)
    squeeze_2d = labels.ndim == 2
    if squeeze_2d:
        labels = labels[..., None]
        anisotropy = tuple(anisotropy) + (1.0,)
    assert labels.ndim == 3, "edt expects a 2D or 3D volume"
    shape = labels.shape

    d = jnp.full(shape, BIG, dtype=jnp.float32)
    ndim_iter = 2 if squeeze_2d else 3  # 2D: borderless singleton z axis
    for axis in range(ndim_iter):
        w = float(anisotropy[axis])
        n = shape[axis]
        if n == 1:
            # only contribution along a singleton axis is the black border
            if black_border:
                d = jnp.minimum(d, np.float32(w) ** 2)
            continue
        # tile so each broadcast block stays ~64MB regardless of line length
        line_block = max(1, min(128, (1 << 24) // max(1, n * n)))
        lab_t = _axis_to_last(labels, axis).reshape(-1, n)
        d_t = _axis_to_last(d, axis).reshape(-1, n)
        out = _parabola_pass(d_t, lab_t, w, bool(black_border), line_block)
        out = out.reshape(_axis_to_last(d, axis).shape)
        d = jnp.moveaxis(out, -1, axis)

    d = jnp.where(labels == 0, 0.0, d)
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
    (intake.py:178-183). `voxel_graph` is accepted for API parity; masking
    connectivity during EDT is not yet supported on device.
    """
    if voxel_graph is not None:
        raise NotImplementedError(
            "voxel_graph-aware EDT is not yet supported on the TPU path"
        )
    return jnp.sqrt(edtsq(labels, anisotropy, black_border))
