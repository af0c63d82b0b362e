"""Multi-chip end-to-end skeletonization.

`skeletonize_sharded` runs the FULL pipeline with the volume sharded over a
`jax.sharding.Mesh`: the preamble field kernels (CCL, multi-label EDT)
execute as mesh collectives (ring min-plus / halo sweeps, iterated to a
psum'd fixpoint — parallel/sharded.py), metadata extraction (compact ids,
counts, bounding boxes) runs on the sharded arrays under GSPMD, and
per-label tracing gathers each component's bbox crop off the mesh and
drives the same batched trace engine as the single-chip path — so a
multi-chip run produces the same skeletons as `kimimaro_tpu.skeletonize`.

The reference's analogue is the whole of intake.py:58-266 (its process
pool fans labels over shm workers; here the volume itself is sharded and
labels are traced from gathered crops). Scaling story: SURVEY.md §5.8.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .sharded import (
    AXIS,
    make_mesh,
    shard_map,
    shard_volume,
    sharded_ccl_rounds,
    sharded_edtsq,
)
from jax.sharding import PartitionSpec as P


def _gather_crops_sharded(cc, dbf, offs, mesh, bshape, vg=None):
    """Batched device-side crop gather off a mesh-sharded volume: each
    device slices every requested crop's intersection with its local
    axis-0 shard (zeros elsewhere) and one psum assembles the replicated
    crop stacks — O(1) collective dispatches per engine chunk instead of a
    per-label host device_get loop (VERDICT r3 item 7). `vg`: optional
    voxel_graph volume gathered alongside (same shard layout)."""
    B0 = int(bshape[0])
    has_vg = vg is not None

    def local(cc_l, dbf_l, vg_l, offs_l):
        h = cc_l.shape[0]
        start = jax.lax.axis_index(AXIS).astype(jnp.int32) * h
        ccp = jnp.pad(cc_l, ((B0, B0), (0, 0), (0, 0)))
        dbp = jnp.pad(dbf_l, ((B0, B0), (0, 0), (0, 0)))
        vgp = (jnp.pad(vg_l, ((B0, B0), (0, 0), (0, 0)))
               if has_vg else None)
        rows = jnp.arange(B0, dtype=jnp.int32)

        def one(o):
            # crop rows inside this shard sit at unclamped s0 (see mask
            # proof: any valid row forces 0 < s0 < h + B0); crops entirely
            # elsewhere mask to zero regardless of the clamp
            s0 = jnp.clip(o[0] - start + B0, 0, h + B0)
            c = jax.lax.dynamic_slice(ccp, (s0, o[1], o[2]), bshape)
            d = jax.lax.dynamic_slice(dbp, (s0, o[1], o[2]), bshape)
            m = (o[0] + rows >= start) & (o[0] + rows < start + h)
            out = (jnp.where(m[:, None, None], c, 0),
                   jnp.where(m[:, None, None], d, 0.0))
            if has_vg:
                g = jax.lax.dynamic_slice(vgp, (s0, o[1], o[2]), bshape)
                out = out + (jnp.where(m[:, None, None], g,
                                       jnp.uint32(0)),)
            return out

        outs = jax.vmap(one)(offs_l)
        return tuple(jax.lax.psum(x, AXIS) for x in outs)

    n_out = 3 if has_vg else 2
    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=tuple(P() for _ in range(n_out)),
    ))
    if not has_vg:
        vg = jnp.zeros((int(mesh.devices.size), 1, 1), dtype=jnp.uint32)
    return fn(cc, dbf, vg, offs)


def skeletonize_sharded(
    all_labels,
    mesh=None,
    n_devices: Optional[int] = None,
    teasar_params: Optional[dict] = None,
    anisotropy=(1.0, 1.0, 1.0),
    object_ids=None,
    dust_threshold: int = 1000,
    fix_branching: bool = True,
    fix_borders: bool = True,  # matches the single-chip driver's default
    extra_targets_before=None,
    extra_targets_after=None,
    voxel_graph=None,
    progress: bool = False,
) -> Dict[int, "object"]:
    """Skeletonize a labeled volume sharded over a device mesh.

    Semantics match `kimimaro_tpu.skeletonize` for the supported surface
    (no fill_holes / fix_avocados on the sharded path — route those
    volumes through the single-chip driver). `voxel_graph`: optional
    cc3d-convention adjacency bitfield (same shape as the volume); it
    shards with the volume and gates CCL, EDT walls, and every in-kernel
    trace sweep exactly like the single-chip driver. Returns
    {label: Skeleton} in physical space.
    """
    from .. import engine, intake
    from ..intake import DEFAULT_TEASAR_PARAMS
    from ..ops.ccl import compact_cc, label_info

    teasar_params = dict(DEFAULT_TEASAR_PARAMS if teasar_params is None
                         else teasar_params)

    labels = intake.format_labels(all_labels)
    if object_ids is not None:
        labels = intake.apply_object_mask(labels, object_ids)
    if labels.size == 0 or not labels.any():
        return {}

    minlabel = int(labels[labels != 0].min())
    maxlabel = int(labels.max())

    if mesh is None:
        mesh = make_mesh(n_devices or len(jax.devices()))
    n_dev = int(mesh.devices.size)

    # pad the sharded axis up to a multiple of the mesh. Zero padding is
    # exact: with black_border the pad interface supplies the same boundary
    # term the border would, and zero voxels drop out of CCL/EDT/trace.
    n0 = labels.shape[0]
    pad = (-n0) % n_dev
    if pad:
        labels_padded = np.concatenate(
            [labels, np.zeros((pad,) + labels.shape[1:], labels.dtype)], axis=0
        )
    else:
        labels_padded = labels

    upload = labels_padded
    if upload.dtype.itemsize > 4:
        raise ValueError(
            "skeletonize_sharded: renumber >32-bit labels before sharding"
        )

    lab_dev = shard_volume(jnp.asarray(upload), mesh)

    vg_dev = None
    if voxel_graph is not None:
        vg = np.asarray(voxel_graph)
        assert vg.shape == labels.shape, "voxel_graph must match the volume"
        if pad:
            vg = np.concatenate(
                [vg, np.zeros((pad,) + vg.shape[1:], vg.dtype)], axis=0)
        vg_dev = shard_volume(jnp.asarray(vg).astype(jnp.uint32), mesh)

    # --- sharded preamble: CCL to fixpoint + multi-label EDT (ring pass)
    ids_raw = sharded_ccl_rounds(lab_dev, mesh, voxel_graph=vg_dev)
    cc_dev, n_comp, rep_prefix = compact_cc(ids_raw)
    n_components = int(n_comp)
    if n_components == 0:
        return {}
    del ids_raw

    dsq = sharded_edtsq(
        lab_dev, mesh, anisotropy, black_border=(minlabel == maxlabel),
        voxel_graph=vg_dev,
    )
    dbf_dev = jnp.sqrt(dsq)

    # --- metadata on the sharded arrays (GSPMD partitions the reductions);
    # the fused per-label DBF max feeds the sharded gengine's soma
    # eligibility split, exactly like the single-chip intake
    n_max = 1 << max(int(np.ceil(np.log2(max(n_components, 2)))), 1)
    counts, bbmin, bbmax, orig, dbfmax_arr = jax.device_get(
        label_info(cc_dev, lab_dev, n_max=n_max, rep_prefix=rep_prefix,
                   dbf=dbf_dev)
    )
    counts = np.asarray(counts)[: n_components + 1]
    bbmin = np.asarray(bbmin)[: n_components + 1]
    bbmax = np.asarray(bbmax)[: n_components + 1]
    orig = np.asarray(orig)[: n_components + 1]
    dbfmax_arr = np.asarray(dbfmax_arr)[: n_components + 1]
    remapping = {i: int(orig[i]) for i in range(1, n_components + 1)}

    extra_targets_before = intake.points_to_labels(
        extra_targets_before or [], cc_dev
    )
    extra_targets_after = intake.points_to_labels(
        extra_targets_after or [], cc_dev
    )

    border_targets = defaultdict(list)
    if fix_borders:
        # border planes of the REAL volume (exclude the zero padding)
        border_targets = intake.compute_border_targets(
            cc_dev[:n0], anisotropy
        )

    jobs = []
    for segid in range(1, n_components + 1):
        if counts[segid] <= dust_threshold:
            continue
        mn = bbmin[segid].astype(np.int64)
        shape = bbmax[segid].astype(np.int64) - mn + 1
        if int(np.prod(shape)) <= 1:
            continue

        manual_before, manual_after, root = [], [], None

        def translate(targets):
            return [
                tuple(int(c) - int(m) for c, m in zip(t, mn)) for t in targets
            ]

        if len(border_targets[segid]) > 0:
            manual_before = translate(border_targets[segid])
            root = manual_before.pop()
        if segid in extra_targets_before and extra_targets_before[segid]:
            manual_before.extend(translate(extra_targets_before[segid]))
        if segid in extra_targets_after and extra_targets_after[segid]:
            manual_after.extend(translate(extra_targets_after[segid]))

        jobs.append({
            "segid": segid, "offset": mn, "shape": shape,
            "before": manual_before, "after": manual_after, "root": root,
            "dbfmax": float(dbfmax_arr[segid]),
        })

    # --- per-label tracing, stage 1: the SHARDED lock-step engine (the
    # gengine's multi-chip form — parallel/gengine.py) traces every
    # eligible label with the volume still on the mesh; only ineligible
    # labels (soma candidates, oversized bboxes, target overflow) fall
    # through to the gathered-crop engine below. KIMIMARO_TPU_SHARDED_
    # GENGINE=0 restores the crop-only path.
    import os as _os

    # job offsets survive the eligibility split below (jobs is rebound to
    # the gengine's leftovers)
    offsets_by_segid = {j["segid"]: j["offset"] for j in jobs}

    g_results: Dict[int, list] = {}
    if _os.environ.get("KIMIMARO_TPU_SHARDED_GENGINE", "1") != "0" \
            and vg_dev is None and len(jobs) >= 2:
        from .gengine import trace_global_sharded

        g_results, jobs = trace_global_sharded(
            cc_dev, dbf_dev, jobs, teasar_params, anisotropy,
            fix_branching, mesh, progress=progress,
        )

    # --- per-label tracing, stage 2: every remaining batch gathers only
    # its labels' bbox crops off the mesh (a full-volume gather here would
    # OOM the very host/chip the sharding exists to spare) and drives the
    # same batched engine the single-chip path uses. The gather itself is
    # ONE device-side dispatch per chunk (_gather_crops_sharded); pad
    # lanes beyond n_real are zeroed like the old host loop left them.
    def crop_source(crop_offs, n_real, bshape):
        offs = np.zeros((len(crop_offs), 3), np.int32)
        offs[:n_real] = np.asarray(crop_offs[:n_real], dtype=np.int32)
        got = _gather_crops_sharded(
            cc_dev, dbf_dev, jnp.asarray(offs), mesh,
            tuple(int(b) for b in bshape), vg=vg_dev,
        )
        lane = jnp.arange(len(crop_offs))[:, None, None, None] < n_real
        out = (jnp.where(lane, got[0], 0), jnp.where(lane, got[1], 0.0))
        if vg_dev is not None:
            out = out + (jnp.where(lane, got[2], jnp.uint32(0)),)
        return out

    results, fallback_jobs = engine.trace_batched(
        cc_dev, dbf_dev, jobs, teasar_params, anisotropy,
        fix_branching, progress=progress, crop_source=crop_source,
        voxel_graph=vg_dev,
    )
    results.update(g_results)

    skeletons = defaultdict(list)
    for segid, path_list in results.items():
        skel = engine.paths_to_skeleton(path_list, anisotropy)
        if skel.empty():
            continue
        skel.vertices += offsets_by_segid[segid].astype(np.float32)
        skel.id = remapping[segid]
        skel.vertices = np.multiply(
            skel.vertices, anisotropy, dtype=np.float32
        )
        skel.space = "physical"
        skeletons[skel.id].append(skel)

    # _run_host_fallback slices each job's bbox from the sharded arrays
    # directly (crop-sized fetches only)
    intake._run_host_fallback(
        fallback_jobs, cc_dev, dbf_dev, vg_dev, remapping, skeletons,
        teasar_params, anisotropy, fix_branching,
    )

    return intake.merge(skeletons)
