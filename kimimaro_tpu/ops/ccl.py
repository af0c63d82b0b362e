"""26-connected multi-label connected components labeling on device.

TPU-native replacement for the `cc3d` C++ dependency
(/root/reference/kimimaro/utility.py:58-83, intake.py:162). Voxels belong to
the same component iff they share the same nonzero label and are
26-connected within it.

Design: label propagation + pointer jumping ("FastSV"-style). Each voxel
starts as its own 1-based linear index; every round takes the minimum index
over same-label 26-neighbors (a static stencil of shifted mins) and then
performs two pointer-jump hops (a flat gather). Convergence is
O(log(component diameter)) rounds — dense vector work that maps directly
onto the VPU, versus the sequential union-find scan the CPU reference uses.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stencils import neighborhood_offsets, shifted

OFFSETS26 = neighborhood_offsets(26)


@jax.jit
def _ccl_fixpoint(labels):
    fg = labels != 0
    n = labels.size
    lin = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(labels.shape)
    ids0 = jnp.where(fg, lin, 0)

    def stencil_min(ids):
        best = ids
        for off in OFFSETS26:
            nb_ids = shifted(ids, off, 0)
            nb_lab = shifted(labels, off, 0)
            ok = fg & (nb_lab == labels) & (nb_ids > 0) & (nb_ids < best)
            best = jnp.where(ok, nb_ids, best)
        return best

    def jump(ids):
        flat = ids.ravel()
        hop = flat[jnp.maximum(flat - 1, 0)]
        return jnp.where(flat > 0, hop, 0).reshape(ids.shape)

    def body(state):
        ids, _, i = state
        new = stencil_min(ids)
        new = jump(jump(new))
        changed = jnp.any(new != ids)
        return new, changed, i + 1

    def cond(state):
        _, changed, i = state
        return jnp.logical_and(changed, i < 1024)

    ids, _, _ = jax.lax.while_loop(cond, body, (ids0, jnp.bool_(True), 0))
    return ids


def connected_components(labels) -> jnp.ndarray:
    """Raw 26-connected multi-label CCL. Returns an int32 volume where each
    component is labeled by the (1-based) minimum linear index of its voxels;
    background is 0. Use `renumber_cc` to compact to 1..N."""
    labels = jnp.asarray(labels)
    assert labels.ndim == 3
    return _ccl_fixpoint(labels)


@jax.jit
def compact_cc(cc_raw):
    """Device-side compaction of raw CCL output to contiguous 1..N in
    first-appearance (scan) order — the fastremap.renumber convention — with
    zero host transfers of the full volume.

    The raw id of a component equals 1 + the minimum linear index of its
    voxels, so representatives are exactly the voxels where id == lin+1;
    numbering them by prefix-sum over scan order reproduces the reference's
    first-appearance numbering (utility.py:58-83).

    Returns (cc int32 compact, n_components, rep_lin (flat) int32 where
    rep_lin[k-1] = linear index of component k's representative).
    """
    n = cc_raw.size
    flat = cc_raw.ravel()
    lin = jnp.arange(1, n + 1, dtype=flat.dtype)
    repmask = flat == lin  # background (0) never matches
    prefix = jnp.cumsum(repmask.astype(jnp.int32))
    new_at_rep = jnp.where(repmask, prefix, 0)
    # every voxel's component id: look up the new id stored at its root
    cc = jnp.where(flat > 0, new_at_rep[jnp.maximum(flat - 1, 0)], 0)
    n_components = prefix[-1]
    return cc.reshape(cc_raw.shape).astype(jnp.int32), n_components


@functools.partial(jax.jit, static_argnames=("n_max",))
def label_info(cc, orig_labels, n_max: int):
    """Per-component metadata on device: voxel counts, bounding boxes, and
    the original label of each component (the get_mapping equivalent,
    reference skeletontricks.pyx:490-525). One small fetch replaces a full
    volume readback.

    Returns (counts (n_max+1,), bbox_min (n_max+1,3), bbox_max (n_max+1,3)
    inclusive, orig (n_max+1,)).
    """
    shape = cc.shape
    flat = cc.ravel().astype(jnp.int32)
    counts = jnp.bincount(flat, length=n_max + 1)

    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 0).ravel()
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).ravel()
    gz = jax.lax.broadcasted_iota(jnp.int32, shape, 2).ravel()

    big = jnp.int32(np.iinfo(np.int32).max)
    bbox_min = jnp.full((n_max + 1, 3), big, dtype=jnp.int32)
    bbox_max = jnp.full((n_max + 1, 3), -1, dtype=jnp.int32)
    for axis, g in enumerate((gx, gy, gz)):
        bbox_min = bbox_min.at[flat, axis].min(g)
        bbox_max = bbox_max.at[flat, axis].max(g)

    # original label per component (labels must fit uint32; the intake
    # layer falls back to a host mapping for wider dtypes)
    orig = jnp.zeros((n_max + 1,), dtype=jnp.uint32)
    orig = orig.at[flat].max(orig_labels.ravel().astype(jnp.uint32))
    return counts, bbox_min, bbox_max, orig


def renumber_cc(
    cc_raw: np.ndarray, orig_labels: np.ndarray
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Host-side compaction of raw CCL output to contiguous 1..N ids, plus
    the cc-id -> original-label mapping (reference
    skeletontricks.get_mapping, utility.py:82)."""
    cc_raw = np.asarray(cc_raw)
    orig_labels = np.asarray(orig_labels)
    uniq, first_idx, inv = np.unique(cc_raw, return_index=True, return_inverse=True)
    # uniq[0] may be 0 (background); map it to 0
    new_ids = np.arange(len(uniq), dtype=np.int64)
    if len(uniq) and uniq[0] == 0:
        pass  # background already maps to 0
    else:
        new_ids = new_ids + 1  # no background present
    cc = new_ids[inv].reshape(cc_raw.shape)

    dtype = np.uint32 if len(uniq) < 2**32 else np.uint64
    cc = cc.astype(dtype)

    remapping: Dict[int, int] = {}
    flat_orig = orig_labels.reshape(-1)
    for uid, fidx in zip(new_ids, first_idx):
        if uid == 0:
            continue
        remapping[int(uid)] = int(flat_orig[fidx])
    return cc, remapping
