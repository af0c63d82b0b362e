"""Cross-sectional area analysis along skeleton paths.

TPU-native rebuild of /root/reference/kimimaro/utility.py:168-560 (xs3d
call sites replaced by the device plane-section kernel in ops.xsarea).
Adds `cross_sectional_area` / `cross_sectional_area_contacts` per-vertex
attributes; supports smoothing_window, step, multipass, repair_contacts.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, List, Optional, Union

import numpy as np

from .ops.xsarea import cross_section_areas
from .skeleton import Skeleton
from .utility import add_property, find_objects, moving_average
from .utils.bbox import Bbox

XS_PROP = {
    "id": "cross_sectional_area",
    "data_type": "float32",
    "num_components": 1,
}
XS_CONTACT_PROP = {
    "id": "cross_sectional_area_contacts",
    "data_type": "uint8",
    "num_components": 1,
}


def _id_bboxes_device(all_labels, ids):
    """Inclusive per-id bounding boxes straight off the RAW label volume —
    no renumber, no relabeled copy. One device pass per axis: sort the
    packed key label*dim + coord; each id's voxels form one contiguous run
    whose first/last entries are its bbox extremes (same machinery as
    ops.ccl.label_info, reference utility.py:86-90's find_objects role).
    Returns {id: (mn (3,), mx (3,))} for ids present in the volume, or
    None when the dtype/id range can't be packed (caller falls back to the
    host renumber path)."""
    import jax
    import jax.numpy as jnp

    from .ops.ccl import runs_bbox

    ids = np.asarray(sorted({int(i) for i in ids}), dtype=np.int64)
    if ids.size == 0:
        return {}
    shape = all_labels.shape
    # ids ride an int32 sort key (no coordinate packing needed)
    if (all_labels.dtype.kind not in "ui"
            or int(ids.max()) >= 2**31 - 1
            or int(ids.min()) < 0):
        return None

    @functools.lru_cache(maxsize=8)
    def kernel(shp, nids):
        @jax.jit
        def run(flat, ids_d):
            _counts, mn, mx, present = runs_bbox(
                flat.astype(jnp.int32), shp, ids_d)
            mn = jnp.where(present[:, None], mn, -1)
            mx = jnp.where(present[:, None], mx, -1)
            return mn, mx

        return run

    # pad the id list so one compilation serves nearby query sizes
    nids = 1 << max(int(np.ceil(np.log2(ids.size))), 4)
    ids_p = np.concatenate(
        [ids, np.full(nids - ids.size, ids[-1], dtype=np.int64)])
    mn, mx = kernel(tuple(int(s) for s in shape), nids)(
        jnp.asarray(np.ascontiguousarray(all_labels).reshape(-1)),
        jnp.asarray(ids_p.astype(np.int32)))
    mn = np.asarray(jax.device_get(mn))[: ids.size]
    mx = np.asarray(jax.device_get(mx))[: ids.size]
    out = {}
    for k, i in enumerate(ids):
        if mn[k, 0] >= 0:
            out[int(i)] = (mn[k], mx[k])
    return out


def shape_iterator(all_labels, skeletons, fill_holes, in_place, progress, fn):
    """Iterate skeletons with their grown binary bbox crops
    (reference utility.py:114-166)."""
    from .ops import fill as fill_ops
    import jax

    if isinstance(skeletons, dict):
        iterator = list(skeletons.values())
    elif hasattr(skeletons, "vertices"):
        iterator = [skeletons]
    else:
        iterator = list(skeletons)

    import time as _time

    from .utils import profiling

    all_labels = np.asarray(all_labels)

    if all_labels.dtype != bool:
        from . import native

        _t0 = _time.perf_counter()
        want = [s.id for s in iterator if s.id != 0]
        # host single-pass first (no upload, no renumber), then the device
        # sort path, then the generic renumber+find_objects fallback
        bboxes = native.bbox_ids(all_labels, want)
        if bboxes is None:
            bboxes = _id_bboxes_device(all_labels, want)
        profiling.count("xs_bbox_ms",
                        int(1000 * (_time.perf_counter() - _t0)))
        if bboxes is not None:
            for skel in iterator:
                if skel.id == 0 or skel.id not in bboxes:
                    continue
                mn, mx = bboxes[skel.id]
                roi = Bbox(mn, mx + 1)
                if roi.volume() <= 1:
                    continue
                roi.grow(1)
                roi.minpt = np.clip(roi.minpt, 0, None)
                roi.maxpt = np.minimum(
                    roi.maxpt, np.array(all_labels.shape))
                slices = roi.to_slices()
                binimg = all_labels[slices] == skel.id
                if fill_holes:
                    binimg = np.asarray(
                        jax.device_get(fill_ops.fill(binimg)))
                fn(skel, binimg, roi)
            return iterator

    _t0 = _time.perf_counter()
    if all_labels.dtype == bool:
        remapping = {True: 1, False: 0, 1: 1, 0: 0}
        lookup = all_labels.view(np.uint8)
    else:
        uniq, first_idx, inv = np.unique(
            all_labels, return_index=True, return_inverse=True
        )
        has_bg = len(uniq) > 0 and uniq[0] == 0
        fg_uniq = uniq[1:] if has_bg else uniq
        fg_first = first_idx[1:] if has_bg else first_idx
        order = np.argsort(fg_first, kind="stable")
        new_ids = np.empty(len(fg_uniq), dtype=np.int64)
        new_ids[order] = np.arange(1, len(fg_uniq) + 1)
        full_new = np.concatenate([[0], new_ids]) if has_bg else new_ids
        lookup = full_new[inv].reshape(all_labels.shape)
        remapping = {int(u): int(n) for u, n in zip(fg_uniq, new_ids)}
    profiling.count("xs_renumber_ms",
                    int(1000 * (_time.perf_counter() - _t0)))

    _t0 = _time.perf_counter()
    all_slices = find_objects(lookup)
    profiling.count("xs_findobj_ms",
                    int(1000 * (_time.perf_counter() - _t0)))

    for skel in iterator:
        label = 1 if all_labels.dtype == bool else skel.id
        if label == 0 or label not in remapping:
            continue
        label = remapping[label]
        slices = all_slices[label - 1]
        if slices is None:
            continue

        roi = Bbox.from_slices(slices)
        if roi.volume() <= 1:
            continue
        roi.grow(1)
        roi.minpt = np.clip(roi.minpt, 0, None)
        roi.maxpt = np.minimum(roi.maxpt, np.array(lookup.shape))
        slices = roi.to_slices()

        binimg = lookup[slices] == label
        if fill_holes:
            binimg = np.asarray(jax.device_get(fill_ops.fill(binimg)))

        fn(skel, binimg, roi)

    return iterator


def cross_sectional_area(
    all_labels,
    skeletons: Union[Dict[int, Skeleton], List[Skeleton], Skeleton],
    anisotropy=np.array([1, 1, 1], dtype=np.float32),
    smoothing_window: int = 1,
    progress: bool = False,
    in_place: bool = False,
    fill_holes: bool = False,
    multipass: bool = False,
    repair_contacts: bool = False,
    visualize_section_planes: bool = False,
    step: int = 1,
):
    """Per-vertex cross sectional areas for skeletons embedded in a labeled
    volume (reference utility.py:351-560). The plane normal at each vertex
    is the smoothed path tangent (forward+backward moving average to kill
    phase shift, reference utility.py:457-460).

    Default path: ALL skeletons' plane queries are batched into shared
    device dispatches against the volume uploaded once (ops.xsbatch) —
    per-label crops and their dispatch latency are gone. fill_holes /
    visualize_section_planes (or KIMIMARO_TPU_XS_BATCHED=0) ride the
    per-label bbox path instead."""
    import os

    assert step > 0
    assert smoothing_window > 0

    anisotropy = np.asarray(anisotropy, dtype=np.float32)

    batched_ok = (
        not fill_holes
        and not visualize_section_planes
        and os.environ.get("KIMIMARO_TPU_XS_BATCHED", "1") != "0"
    )
    if batched_ok and _cross_sectional_area_batched(
            all_labels, skeletons, anisotropy, smoothing_window,
            multipass, repair_contacts, step):
        return skeletons

    def helper(skel, binimg, roi):
        _cross_sectional_area_impl(
            binimg, skel, roi, anisotropy, smoothing_window,
            multipass, repair_contacts, visualize_section_planes, step,
        )

    shape_iterator(all_labels, skeletons, fill_holes, in_place, progress, helper)

    if hasattr(skeletons, "vertices"):
        skelitr = [skeletons]
    elif isinstance(skeletons, dict):
        skelitr = list(skeletons.values())
    else:
        skelitr = list(skeletons)

    for skel in skelitr:
        add_property(skel, XS_PROP)
        add_property(skel, XS_CONTACT_PROP)
        if not hasattr(skel, "cross_sectional_area"):
            skel.cross_sectional_area = np.full(
                len(skel.vertices), -1, dtype=np.float32
            )
        if not hasattr(skel, "cross_sectional_area_contacts"):
            skel.cross_sectional_area_contacts = np.zeros(
                len(skel.vertices), dtype=np.uint8
            )

    return skeletons


def cross_sectional_area_single(
    binimg,
    skel: Skeleton,
    roi: Optional[Bbox] = None,
    anisotropy=np.array([1, 1, 1], dtype=np.float32),
    smoothing_window: int = 1,
    progress: bool = False,
    in_place: bool = False,
    multipass: bool = False,
    repair_contacts: bool = False,
    visualize_section_planes: bool = False,
    step: int = 1,
) -> Skeleton:
    """Cross sectional areas for one skeleton + overlapping binary image
    (reference utility.py:168-349)."""
    assert step > 0
    assert smoothing_window > 0
    anisotropy = np.asarray(anisotropy, dtype=np.float32)
    return _cross_sectional_area_impl(
        binimg, skel, roi, anisotropy, smoothing_window,
        multipass, repair_contacts, visualize_section_planes, step,
    )


def _collect_queries(skel, shape, roi_min, anisotropy, smoothing_window,
                     multipass, repair_contacts, step):
    """Gather this skeleton's (vertex, normal) sectioning queries with the
    reference's per-path stride / branch-point / repair gating (reference
    utility.py:449-511). Shared by the per-label and cross-label drivers.

    Returns (areas, contacts, query_verts (Q,3) int, query_normals (Q,3),
    query_idx (Q,), branch_pts set)."""
    shape = np.asarray(shape)
    if skel.space == "physical":
        all_verts = (skel.vertices / anisotropy).round().astype(int)
    else:
        all_verts = np.copy(skel.vertices).astype(int)
    if roi_min is not None:
        all_verts = all_verts - roi_min

    mapping = {tuple(v): i for i, v in enumerate(all_verts)}
    visited = np.zeros(all_verts.shape[0], dtype=bool)

    if repair_contacts or (multipass and hasattr(skel, "cross_sectional_area")):
        areas = skel.cross_sectional_area
        contacts = skel.cross_sectional_area_contacts
    else:
        # zero = "skipped in this pass" (the step>1 stride test relies on
        # it: reference automated_test.py:588-604); -1 marks skeletons the
        # driver never visited at all (reference utility.py:253-255,556)
        areas = np.zeros(all_verts.shape[0], dtype=np.float32)
        contacts = np.zeros(all_verts.shape[0], dtype=np.uint8)

    branch_pts = set(int(b) for b in skel.branches())

    query_verts: List[tuple] = []
    query_normals: List[np.ndarray] = []
    query_idx: List[int] = []

    for path in skel.paths():
        if skel.space == "physical":
            path = (path / anisotropy).round().astype(int)
        else:
            path = path.astype(int)
        if roi_min is not None:
            path = path - roi_min
        if len(path) < 2:
            continue

        normals = (path[1:] - path[:-1]).astype(np.float32)
        normals = np.concatenate([normals, [normals[-1]]])
        # forward+backward moving average kills phase shift
        normals = moving_average(normals, smoothing_window)
        normals = moving_average(normals[::-1], smoothing_window)[::-1]
        norm = np.linalg.norm(normals, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        normals = normals / norm

        end_i = len(path) - 1
        ct = 0
        for i, vert in enumerate(path):
            ct += 1
            if ct < step and not (i == 0 or i == end_i):
                continue
            elif ct == step:
                ct = 0

            if np.any(vert < 0) or np.any(vert >= shape):
                continue

            idx = mapping[tuple(vert)]
            if (
                areas[idx] == 0
                or (idx in branch_pts)
                or (repair_contacts and contacts[idx] > 0 and not visited[idx])
            ):
                visited[idx] = True
                query_verts.append(tuple(vert))
                query_normals.append(normals[i])
                query_idx.append(idx)

    return areas, contacts, query_verts, query_normals, query_idx, branch_pts


def _apply_results(skel, areas, contacts, query_idx, branch_pts,
                   qareas, qcontacts, repair_contacts):
    """Scatter device results back onto the skeleton (branch points are
    averaged over their incident paths, reference utility.py:517-518)."""
    branch_pt_vals = defaultdict(list)
    for k, idx in enumerate(query_idx):
        areas[idx] = qareas[k]
        if repair_contacts:
            contacts[idx] = qcontacts[k]
        else:
            contacts[idx] |= qcontacts[k]
        if idx in branch_pts:
            branch_pt_vals[idx].append(float(qareas[k]))

    for idx, vals in branch_pt_vals.items():
        areas[idx] = sum(vals) / len(vals)

    skel.cross_sectional_area = np.asarray(areas, dtype=np.float32)
    skel.cross_sectional_area_contacts = np.asarray(contacts, dtype=np.uint8)

    add_property(skel, XS_PROP)
    add_property(skel, XS_CONTACT_PROP)
    return skel


def _cross_sectional_area_batched(
    all_labels, skeletons, anisotropy, smoothing_window,
    multipass, repair_contacts, step,
) -> bool:
    """Cross-label batched driver: every skeleton's queries in shared
    full-volume device dispatches (ops.xsbatch). Returns False when the
    volume can't ride the device equality test (caller falls back)."""
    from .ops.xsbatch import cross_section_areas_volume

    if isinstance(skeletons, dict):
        skelitr = list(skeletons.values())
    elif hasattr(skeletons, "vertices"):
        skelitr = [skeletons]
    else:
        skelitr = list(skeletons)

    all_labels = np.asarray(all_labels)
    if all_labels.ndim != 3 or (
            all_labels.dtype != bool and all_labels.dtype.kind not in "ui"):
        return False
    shape = all_labels.shape

    states = []
    qv, qn, qlab, qrad = [], [], [], []
    for skel in skelitr:
        label = 1 if all_labels.dtype == bool else skel.id
        if label == 0 or skel.vertices.shape[0] == 0:
            continue
        areas, contacts, verts, normals, idx, branch_pts = _collect_queries(
            skel, shape, None, anisotropy, smoothing_window,
            multipass, repair_contacts, step)
        states.append((skel, areas, contacts, idx, branch_pts, len(verts)))
        if verts:
            qv.append(np.asarray(verts, dtype=np.int32))
            qn.append(np.asarray(normals, dtype=np.float32))
            qlab.append(np.full(len(verts), label, dtype=np.int64))
            radii = skel.radii if skel.radii.size else None
            if radii is None:
                qrad.append(np.full(len(verts), -1.0, dtype=np.float32))
            else:
                vmap_idx = np.asarray(idx, dtype=np.int64)
                qrad.append(radii[vmap_idx].astype(np.float32))

    if qv:
        out = cross_section_areas_volume(
            all_labels,
            np.concatenate(qv), np.concatenate(qn), np.concatenate(qlab),
            anisotropy, radii=np.concatenate(qrad))
        if out is None:
            return False
        qareas, qcontacts = out
    else:
        qareas = np.zeros(0, dtype=np.float32)
        qcontacts = np.zeros(0, dtype=np.uint8)

    off = 0
    for skel, areas, contacts, idx, branch_pts, nq in states:
        _apply_results(skel, areas, contacts, idx, branch_pts,
                       qareas[off: off + nq], qcontacts[off: off + nq],
                       repair_contacts)
        off += nq

    for skel in skelitr:
        add_property(skel, XS_PROP)
        add_property(skel, XS_CONTACT_PROP)
        if not hasattr(skel, "cross_sectional_area"):
            skel.cross_sectional_area = np.full(
                len(skel.vertices), -1, dtype=np.float32)
        if not hasattr(skel, "cross_sectional_area_contacts"):
            skel.cross_sectional_area_contacts = np.zeros(
                len(skel.vertices), dtype=np.uint8)
    return True


def _cross_sectional_area_impl(
    binimg, skel, roi, anisotropy, smoothing_window,
    multipass, repair_contacts, visualize_section_planes, step,
) -> Skeleton:
    binimg = np.asarray(binimg)
    shape = np.array(binimg.shape)

    roi_min = roi.minpt if roi is not None else None
    areas, contacts, query_verts, query_normals, query_idx, branch_pts = \
        _collect_queries(skel, shape, roi_min, anisotropy,
                         smoothing_window, multipass, repair_contacts, step)

    if query_verts:
        qareas, qcontacts = cross_section_areas(
            binimg, np.array(query_verts), np.array(query_normals), anisotropy
        )
    else:
        qareas = np.zeros(0, dtype=np.float32)
        qcontacts = np.zeros(0, dtype=np.uint8)

    if visualize_section_planes and query_verts:
        from .ops.xsarea import cross_section_image

        cross_sections = np.zeros(binimg.shape, dtype=np.uint32)
        for k, idx in enumerate(query_idx):
            img = cross_section_image(
                binimg, query_verts[k], query_normals[k], anisotropy
            )
            cross_sections[img > 0] = idx
        try:
            import microviewer

            microviewer.view(cross_sections, seg=True)
        except ImportError:
            print("kimimaro_tpu: microviewer not installed; skipping view.")

    return _apply_results(skel, areas, contacts, query_idx, branch_pts,
                          qareas, qcontacts, repair_contacts)
