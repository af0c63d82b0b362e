"""Whole-image skeletonization pipeline (the `skeletonize` driver).

TPU-native rebuild of /root/reference/kimimaro/intake.py. The reference's
preamble (CCL, EDT, bboxes, border targets) runs as device field sweeps; the
per-label TEASAR stage is a host loop over connected components with all
heavy sweeps on device. The reference's multiprocess fan-out + POSIX shared
memory (intake.py:222-266,344-432) has no analogue here: a single
accelerator already executes each label's field sweeps data-parallel across
the whole volume, and multi-chip scaling shards the *volume* instead
(see kimimaro_tpu.parallel).

Label crops are padded up to power-of-two size buckets so XLA compiles a
bounded number of kernel shapes for any input.
"""

from __future__ import annotations

import os

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np
import scipy.spatial

import jax
import jax.numpy as jnp

from . import trace as trace_mod
from .ops import edt as edt_ops
from .ops import fill as fill_ops
from .ops.ccl import connected_components
from .skeleton import Skeleton
from .utility import compute_cc_labels, find_objects
from .utils.bbox import Bbox


class DimensionError(Exception):
    pass


# reference intake.py:47-56
DEFAULT_TEASAR_PARAMS = {
    "scale": 1.5,
    "const": 300,
    "pdrf_scale": 100000,
    "pdrf_exponent": 4,
    "soma_acceptance_threshold": 3500,
    "soma_detection_threshold": 750,
    "soma_invalidation_const": 300,
    "soma_invalidation_scale": 2,
}


def skeletonize(
    all_labels,
    teasar_params=DEFAULT_TEASAR_PARAMS,
    anisotropy: Sequence[float] = (1, 1, 1),
    object_ids=None,
    dust_threshold: int = 1000,
    progress: bool = False,
    fix_branching: bool = True,
    in_place: bool = False,
    fix_borders: bool = True,
    parallel: int = 1,
    parallel_chunk_size: int = 100,
    extra_targets_before=[],
    extra_targets_after=[],
    fill_holes: bool = False,
    fix_avocados: bool = False,
    voxel_graph=None,
) -> Dict[int, Skeleton]:
    """Skeletonize all nonzero labels of a 2D/3D integer volume.

    Drop-in behavioral equivalent of the reference kimimaro.skeletonize
    (intake.py:58-266). Returns {segid: Skeleton} with vertices in physical
    space. `parallel`/`parallel_chunk_size` are accepted for API parity; the
    device executes each label's sweeps data-parallel already.
    """
    import time as _time0

    _t_prep = _time0.perf_counter()
    anisotropy = np.array(anisotropy, dtype=np.float32)

    # compressed volumes stream slab-by-slab straight to the device (the
    # reference's CrackleArray economy, intake.py:459, utility.py:63-92):
    # the full uncompressed array never exists on the host. The optional
    # host transforms (fill_holes / fix_avocados) are whole-volume by
    # nature and force materialization.
    from .carray import CompressedLabelVolume

    streaming = (
        isinstance(all_labels, CompressedLabelVolume)
        and not (fill_holes or fix_avocados)
    )
    if streaming:
        clv = all_labels
        if clv.size <= dust_threshold:
            return {}
        minlabel, maxlabel, wide_back, stream_upload = _plan_streaming(
            clv, object_ids
        )
        if minlabel == 0 and maxlabel == 0:
            return {}
    else:
        # the defensive copy (in_place=False contract: never mutate the
        # caller's array) is only needed when a stage actually writes:
        # object masking and the host transforms. The pure device path
        # only reads, so it may share the caller's buffer.
        will_mutate = (
            object_ids is not None or fill_holes or fix_avocados
        )
        all_labels = format_labels(
            all_labels, in_place=in_place or not will_mutate)
        all_labels = apply_object_mask(all_labels, object_ids)

        if all_labels.size <= dust_threshold:
            return {}

        minlabel, maxlabel = int(all_labels.min()), int(all_labels.max())
        if minlabel == 0 and maxlabel == 0:
            return {}

        # labels wider than 32 bits are renumbered on host first (the
        # device works in 32-bit); wide_back restores original ids at the
        # end
        wide_back = None
        if all_labels.dtype.itemsize > 4:
            u = np.unique(all_labels)
            u_nz = u[u != 0]
            compact = np.searchsorted(u_nz, all_labels).astype(np.uint32) + 1
            compact[all_labels == 0] = 0
            wide_back = {i + 1: int(v) for i, v in enumerate(u_nz)}
            all_labels = compact

    # --- device-resident preamble (CCL + compact renumber + metadata):
    # the full volumes never round-trip to the host on the fast path
    from .ops.ccl import compact_cc, connected_components, label_info

    from .utils import profiling
    from .utils.profiling import phase

    # shrink the host->device transfer: label VALUES only need to survive
    # the original-label lookup, so ship the narrowest dtype that holds them
    if not streaming:
        upload = all_labels
        if upload.dtype.itemsize > 2 and maxlabel < 2**16:
            upload = upload.astype(np.uint16)
        elif upload.dtype.itemsize > 4:
            upload = upload.astype(np.uint32)

    vg_dev = None
    if voxel_graph is not None:
        vg_host = np.asarray(voxel_graph)
        while vg_host.ndim < 3:
            vg_host = vg_host[..., np.newaxis]
        vg_dev = jnp.asarray(vg_host.astype(np.uint32))

    profiling.count("host_prep_ms",
                    int(1000 * (_time0.perf_counter() - _t_prep)))

    with phase("upload"):
        # h2d of the whole volume rides the tunnel (~30-130 MB/s): keep
        # its cost out of the ccl phase so the breakdown stays honest.
        # Segmentation volumes are run-heavy, so when RLE beats raw bytes
        # the transfer ships (starts, values) and decodes on device
        labels_dev = stream_upload() if streaming else _upload_labels(upload)
        labels_dev.block_until_ready()
    with phase("ccl"):
        cc_raw = connected_components(labels_dev, voxel_graph=vg_dev)
        cc_dev, n_comp, rep_prefix = compact_cc(cc_raw)
        del cc_raw
        n_components = int(n_comp)
        # keep phase attribution honest: without this, the compaction
        # tail executes during the NEXT phase's wall clock
        cc_dev.block_until_ready()
    if n_components == 0:
        return {}

    def fetch_info(cc_dev, dbf_dev=None):
        n_max = 1 << max(int(np.ceil(np.log2(max(n_components, 2)))), 1)
        out = label_info(
            cc_dev, labels_dev, n_max=n_max, rep_prefix=rep_prefix,
            dbf=dbf_dev,
        )
        out = jax.device_get(out)
        return tuple(np.asarray(a)[: n_components + 1] for a in out)

    def edtfn_dev(cc):
        return edt_ops.edt(
            cc,
            anisotropy=tuple(float(a) for a in anisotropy),
            black_border=(minlabel == maxlabel),
            voxel_graph=vg_dev,
        )

    host_stages = fill_holes or fix_avocados
    dbfmax_arr = None  # per-label DBF max; only the device preamble fills it

    if host_stages:
        # optional host transforms need the labels on host once
        cc_labels = np.asarray(jax.device_get(cc_dev))
        uniqcc, firstcc = np.unique(cc_labels, return_index=True)
        flat_orig = all_labels.reshape(-1)
        remapping = {
            int(u): int(flat_orig[f]) for u, f in zip(uniqcc, firstcc) if u != 0
        }

        if fill_holes:
            with phase("fill_holes"):
                cc_labels = fill_all_holes(cc_labels, progress,
                                           vol_dev=cc_dev)

        def edtfn(labels):
            return np.asarray(jax.device_get(edtfn_dev(jnp.asarray(labels))))

        all_dbf = edtfn(cc_labels)
        if fix_avocados:
            cc_labels, all_dbf, remapping = engage_avocado_protection(
                cc_labels, all_dbf, remapping,
                soma_detection_threshold=teasar_params.get(
                    "soma_detection_threshold", 0
                ),
                edtfn=edtfn, progress=progress,
            )
        cc_dev = jnp.asarray(cc_labels)
        dbf_dev = jnp.asarray(all_dbf)
        cc_segids_all, pxct = np.unique(cc_labels, return_counts=True)
        counts_map = dict(zip(cc_segids_all.tolist(), pxct.tolist()))
        slices = find_objects(cc_labels)
        bb = {}
        for sid in cc_segids_all:
            sid = int(sid)
            if sid == 0 or slices[sid - 1] is None:
                continue
            roi = Bbox.from_slices(slices[sid - 1])
            bb[sid] = (roi.minpt, roi.maxpt - 1)
        segid_iter = [
            s for s in counts_map
            if s != 0 and counts_map[s] > dust_threshold and s in bb
        ]
        n_components = int(max(counts_map)) if counts_map else 0
    else:
        with phase("edt"):
            dbf_dev = edtfn_dev(cc_dev)
            dbf_dev.block_until_ready()
        with phase("label_info"):
            # one fused pass also yields the per-label DBF max, which lets
            # the engine statically skip the soma refill/re-EDT branch for
            # labels that cannot trigger it (reference trace.py:104-119
            # gates on dbf_max)
            counts, bbmin, bbmax, orig, dbfmax_arr = fetch_info(
                cc_dev, dbf_dev)
        remapping = {i: int(orig[i]) for i in range(1, n_components + 1)}
        counts_map = {i: int(counts[i]) for i in range(1, n_components + 1)}
        bb = {
            i: (bbmin[i], bbmax[i])
            for i in range(1, n_components + 1)
            if counts[i] > 0
        }
        segid_iter = [
            s for s in range(1, n_components + 1)
            if counts_map.get(s, 0) > dust_threshold and s in bb
        ]

    if wide_back is not None:
        remapping = {k: wide_back[v] for k, v in remapping.items()}

    extra_targets_before = points_to_labels(extra_targets_before, cc_dev)
    extra_targets_after = points_to_labels(extra_targets_after, cc_dev)

    border_targets = defaultdict(list)
    if fix_borders:
        with phase("border_targets"):
            border_targets = compute_border_targets(cc_dev, anisotropy)

    print_quotes(parallel)  # easter egg (reference intake.py:796-803)

    # --- assemble per-label jobs for the batched device engine
    from . import engine

    jobs = []
    for segid in segid_iter:
        mn, mx = bb[segid]
        mn = np.asarray(mn, dtype=np.int64)
        shape = np.asarray(mx, dtype=np.int64) - mn + 1
        if int(np.prod(shape)) <= 1:
            continue

        manual_before, manual_after, root = [], [], None

        def translate(targets):
            return [tuple(int(c) - int(m) for c, m in zip(t, mn)) for t in targets]

        if len(border_targets[segid]) > 0:
            manual_before = translate(border_targets[segid])
            root = manual_before.pop()
        if segid in extra_targets_before and len(extra_targets_before[segid]) > 0:
            manual_before.extend(translate(extra_targets_before[segid]))
        if segid in extra_targets_after and len(extra_targets_after[segid]) > 0:
            manual_after.extend(translate(extra_targets_after[segid]))

        jobs.append({
            "segid": segid,
            "offset": mn,
            "shape": shape,
            "before": manual_before,
            "after": manual_after,
            "root": root,
            "count": counts_map.get(segid, 0),
            "dbfmax": (
                float(dbfmax_arr[segid])
                if dbfmax_arr is not None and segid < len(dbfmax_arr)
                else None
            ),
        })

    with phase("trace_batched"):
        results = {}
        crop_jobs = jobs
        import os as _os

        use_global = (
            vg_dev is None
            and _os.environ.get("KIMIMARO_TPU_GLOBAL_ENGINE", "1") != "0"
        )
        if use_global:
            # the global engine runs every eligible label's trace in
            # full-volume lock-step passes; ineligible/failed labels fall
            # through to the batched crop engine below
            from . import gengine

            firstvox_arr = None
            if not host_stages:
                # rep_prefix encodes each component's lexicographically-
                # first voxel (compact ids are first-appearance ordered)
                import time as _time

                _t_fv = _time.perf_counter()
                fv_flat = np.asarray(jax.device_get(jnp.searchsorted(
                    rep_prefix,
                    jnp.arange(1, n_components + 1, dtype=jnp.int32),
                )))
                profiling.count(
                    "tb_firstvox_ms",
                    int(1000 * (_time.perf_counter() - _t_fv)))
                fv_flat = np.minimum(fv_flat, all_labels.size - 1)
                firstvox_arr = np.zeros((n_components + 1, 3), np.int32)
                firstvox_arr[1:] = np.stack(
                    np.unravel_index(fv_flat, cc_dev.shape), axis=-1
                )
            import time as _time

            _t_g = _time.perf_counter()
            g_results, crop_jobs = gengine.trace_global(
                cc_dev, dbf_dev, jobs, teasar_params, anisotropy,
                fix_branching, firstvox_arr=firstvox_arr,
                progress=progress,
            )
            profiling.count(
                "tb_gengine_ms", int(1000 * (_time.perf_counter() - _t_g)))
            results.update(g_results)

        # self-touch (voxel_graph) volumes ride the same batched engine:
        # the walls thread through every in-kernel sweep/EDT/chase
        import time as _time2

        _t_c = _time2.perf_counter()
        crop_results, fallback_jobs = engine.trace_batched(
            cc_dev, dbf_dev, crop_jobs, teasar_params, anisotropy,
            fix_branching, progress=progress, voxel_graph=vg_dev,
        )
        profiling.count(
            "tb_crop_engine_ms", int(1000 * (_time2.perf_counter() - _t_c)))
        results.update(crop_results)
    profiling.count("engine_jobs", len(jobs) - len(fallback_jobs))
    profiling.count("fallback_jobs", len(fallback_jobs))

    offsets_by_segid = {j["segid"]: j["offset"] for j in jobs}
    with phase("finalize"):
        import time as _timef

        skeletons = defaultdict(list)
        _t_b = _timef.perf_counter()
        batched = engine.paths_to_skeletons_batched(
            results, offsets_by_segid, anisotropy)
        profiling.count("fin_batched_ms",
                        int(1000 * (_timef.perf_counter() - _t_b)))
        _t_b = _timef.perf_counter()
        if batched is None:
            # >=2^16 labels: per-label fallback (identical semantics)
            for segid, path_list in results.items():
                skel = engine.paths_to_skeleton(path_list, anisotropy)
                if skel.empty():
                    continue
                mn = offsets_by_segid[segid]
                skel.vertices += mn.astype(np.float32)
                orig_segid = remapping[segid]
                skel.id = orig_segid
                skel.vertices = np.multiply(
                    skel.vertices, anisotropy, dtype=np.float32
                )
                skel.space = "physical"
                skeletons[orig_segid].append(skel)
        else:
            for segid, skel in batched.items():
                orig_segid = remapping[segid]
                skel.id = orig_segid
                skel.vertices = np.multiply(
                    skel.vertices, anisotropy, dtype=np.float32
                )
                skel.space = "physical"
                skeletons[orig_segid].append(skel)
        profiling.count("fin_wrap_ms",
                        int(1000 * (_timef.perf_counter() - _t_b)))

    # host fallback for jobs exceeding the device buffers
    with phase("host_fallback"):
        _run_host_fallback(
            fallback_jobs, cc_dev, dbf_dev, vg_dev, remapping, skeletons,
            teasar_params, anisotropy, fix_branching,
        )

    with phase("merge"):
        return merge(skeletons)


def _run_host_fallback(
    fallback_jobs, cc_dev, dbf_dev, vg_dev, remapping, skeletons,
    teasar_params, anisotropy, fix_branching,
):
    """Per-label host trace loop for jobs the batched engine couldn't hold
    (manual-target or path-count overflow; reference equivalent: the plain
    serial path, intake.py:434-517)."""
    for job in fallback_jobs:
        segid = job["segid"]
        mn = np.asarray(job["offset"], dtype=np.int64)
        shape = np.asarray(job["shape"], dtype=np.int64)
        slc = tuple(slice(int(a), int(a + s)) for a, s in zip(mn, shape))
        labels_crop = np.asarray(jax.device_get(cc_dev[slc])) == segid
        dbf_crop = np.where(
            labels_crop, np.asarray(jax.device_get(dbf_dev[slc])), 0.0
        ).astype(np.float32)
        vg_crop = vg_dev[slc] if vg_dev is not None else None
        skeleton = trace_mod.trace(
            labels_crop, dbf_crop,
            anisotropy=tuple(float(a) for a in anisotropy),
            fix_branching=fix_branching,
            manual_targets_before=list(job["before"]),
            manual_targets_after=list(job["after"]),
            root=job["root"],
            voxel_graph=vg_crop,
            **teasar_params,
        )
        if skeleton.empty():
            continue
        skeleton.vertices += mn.astype(np.float32)
        orig_segid = remapping[segid]
        skeleton.id = orig_segid
        skeleton.vertices = np.multiply(
            skeleton.vertices, anisotropy, dtype=np.float32
        )
        skeleton.space = "physical"
        skeletons[orig_segid].append(skeleton)


# --------------------------------------------------------------------------- #
# Label formatting / masking (reference intake.py:315-342,519-535)


def format_labels(labels, in_place: bool = False) -> np.ndarray:
    labels = np.asarray(labels)
    if not in_place:
        labels = np.copy(labels)

    if labels.dtype == bool:
        labels = labels.view(np.uint8)

    original_shape = labels.shape
    while labels.ndim < 3:
        labels = labels[..., np.newaxis]
    while labels.ndim > 3:
        if labels.shape[-1] == 1:
            labels = labels[..., 0]
        else:
            raise DimensionError(
                "Input labels may be no more than three non-trivial dimensions. "
                f"Got: {original_shape}"
            )
    return labels


def _rle_decode(lengths_u8, values, size: int, shape):
    """Device-side RLE decode from u8 run lengths: exclusive-cumsum run
    starts, run id per voxel via scatter+cumsum, then a monotone gather of
    run values (every length >= 1, so starts are strictly increasing with
    starts[0] == 0)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("size", "shape"))
    def _decode(lengths_u8, values, size, shape):
        ln = lengths_u8.astype(jnp.int32)
        starts = jnp.cumsum(ln) - ln
        if values.dtype.itemsize <= 2:
            # gather-free decode: scatter value DELTAS at run starts and
            # integrate — a 134M-element `values[run_id]` gather costs
            # ~1s-class time on TPU, a cumsum is bandwidth-bound
            vi = values.astype(jnp.int32)
            deltas = jnp.concatenate([vi[:1], vi[1:] - vi[:-1]])
            acc = jnp.zeros((size,), dtype=jnp.int32).at[starts].add(deltas)
            return jnp.cumsum(acc).astype(values.dtype).reshape(shape)
        ones = jnp.zeros((size,), dtype=jnp.int32).at[starts].set(1)
        run_id = jnp.cumsum(ones) - 1
        return values[run_id].reshape(shape)

    return _decode(lengths_u8, values, size, shape)


def _upload_labels(upload: np.ndarray):
    """Host->device transfer of the labels volume. The tunnel moves
    ~10-130 MB/s, so for run-heavy segmentation volumes shipping RLE and
    decoding on device beats the raw array; falls back to the raw transfer
    when runs are short (worst case, random labels, would otherwise ship
    more than the raw bytes). Runs are shipped as u8 LENGTHS (runs longer
    than 255 split into same-value runs) + values — 3 bytes/run for u16
    volumes vs 6 for the old u32-starts layout; the measured 512^3 dense
    benchmark transfer is the bench's single largest fixed cost."""
    import time as _tm

    from .utils import profiling

    _dbg = os.environ.get("KIMIMARO_TPU_UPLOAD_DEBUG", "0") != "0"
    _t0 = _tm.perf_counter()

    def _note(msg):
        if _dbg:
            import sys as _sys

            print(f"[upload] {msg} at +{_tm.perf_counter() - _t0:.2f}s",
                  file=_sys.stderr, flush=True)

    if upload.size < (1 << 22) or upload.size >= (1 << 32):
        return jnp.asarray(upload)
    # device arrays are logically C-ordered; ravel() copies F-order inputs
    flat = upload.ravel()
    _note("ravel")

    # run cap = the density past which raw bytes win anyway (the 0.6x
    # fallback threshold below)
    cap = int(0.6 * flat.nbytes // (1 + flat.dtype.itemsize)) + 1

    from . import native

    enc = native.rle_encode(flat, cap)
    if enc is not None:
        lengths, values = enc
        total = lengths.size
    else:
        if enc is None and native._load() is not None \
                and flat.dtype.itemsize in (1, 2, 4):
            # cap overflow: run-dense volume, ship raw
            profiling.count("upload_bytes", int(flat.nbytes))
            return jnp.asarray(upload)
        # numpy fallback (no native library / unusual dtype): boundaries
        # of equal-value runs in C linear order, runs > 255 split
        change = np.empty(flat.shape, dtype=bool)
        change[0] = True
        np.not_equal(flat[1:], flat[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        runlen = np.diff(starts, append=flat.size)
        reps = (runlen + 254) // 255
        total = int(reps.sum())
        if total > cap:
            profiling.count("upload_bytes", int(flat.nbytes))
            return jnp.asarray(upload)
        values = flat[starts]
        if total != starts.size:
            idx = np.repeat(np.arange(starts.size), reps)
            lengths = np.full(total, 255, dtype=np.uint8)
            last = np.cumsum(reps) - 1
            lengths[last] = (runlen - (reps - 1) * 255).astype(np.uint8)
            values = values[idx]
        else:
            lengths = runlen.astype(np.uint8)

    rle_bytes = int(total) * (1 + flat.dtype.itemsize)
    if rle_bytes >= 0.6 * flat.nbytes:
        profiling.count("upload_bytes", int(flat.nbytes))
        return jnp.asarray(upload)

    profiling.count("upload_bytes", int(rle_bytes))
    profiling.count("upload_runs", int(total))
    _note("encode")
    ld = jnp.asarray(lengths)
    vd = jnp.asarray(values)
    if _dbg:
        ld.block_until_ready()
        vd.block_until_ready()
        _note("transfer")
    out = _rle_decode(ld, vd, int(flat.size), tuple(upload.shape))
    if _dbg:
        out.block_until_ready()
        _note("decode")
    return out


def _plan_streaming(clv, object_ids):
    """Slab-streaming upload plan for a CompressedLabelVolume: one pass
    over the slabs for min/max (and the >32-bit unique set when needed),
    then an upload closure that device_puts one decompressed slab at a
    time and concatenates ON DEVICE — peak host RAM stays at slab scale
    (reference economy: intake.py:459 decompresses per-label crops from
    the compressed array instead of materializing the volume).

    Returns (minlabel, maxlabel, wide_back, upload_fn)."""
    if not (clv.dtype == bool or np.issubdtype(clv.dtype, np.integer)):
        raise TypeError(
            f"Input labels must be an integer data type. Got: {clv.dtype}"
        )
    obj = None
    if object_ids is not None:
        obj = np.asarray(list(object_ids), dtype=clv.dtype)

    minlabel, maxlabel = None, None
    wide = clv.dtype.itemsize > 4
    uniques = set()
    for _, sl in clv.slabs():
        if obj is not None:
            sl = np.where(np.isin(sl, obj), sl, 0)
        mn, mx = int(sl.min()), int(sl.max())
        minlabel = mn if minlabel is None else min(minlabel, mn)
        maxlabel = mx if maxlabel is None else max(maxlabel, mx)
        if wide:
            uniques.update(np.unique(sl).tolist())

    wide_back = None
    u_nz = None
    if wide:
        u_nz = np.array(sorted(x for x in uniques if x != 0),
                        dtype=clv.dtype)
        wide_back = {i + 1: int(v) for i, v in enumerate(u_nz)}

    def upload():
        import jax.numpy as jnp

        parts = []
        for _, sl in clv.slabs():
            if obj is not None:
                sl = np.where(np.isin(sl, obj), sl, 0)
            if wide:
                compact = np.searchsorted(u_nz, sl).astype(np.uint32) + 1
                compact[sl == 0] = 0
                sl = compact
            if sl.dtype.itemsize > 2 and maxlabel < 2**16:
                sl = sl.astype(np.uint16)
            elif sl.dtype.itemsize > 4:
                sl = sl.astype(np.uint32)
            elif sl.dtype == bool:
                sl = sl.view(np.uint8)
            parts.append(jnp.asarray(sl))
        return jnp.concatenate(parts, axis=2)

    return minlabel, maxlabel, wide_back, upload


def apply_object_mask(all_labels: np.ndarray, object_ids) -> np.ndarray:
    if object_ids is None:
        return all_labels
    keep = np.isin(all_labels, np.asarray(list(object_ids), dtype=all_labels.dtype))
    return np.where(keep, all_labels, 0)


def points_to_labels(pts, cc_labels) -> Dict[int, list]:
    """Bucket (x,y,z) targets by the connected-component label under them
    (reference intake.py:537-542)."""
    mapping = defaultdict(list)
    for pt in pts:
        pt = tuple(int(c) for c in pt)
        mapping[int(cc_labels[pt])].append(pt)
    return mapping


# --------------------------------------------------------------------------- #
# Per-label dispatch (reference intake.py:434-517)

_BUCKET_MIN = 16


def _bucket(n: int) -> int:
    """Round a crop dimension up to the next power of two (>=16) to bound
    the number of distinct compiled kernel shapes."""
    b = _BUCKET_MIN
    while b < n:
        b <<= 1
    return b


def merge(skeletons: Dict[int, List[Skeleton]]) -> Dict[int, Skeleton]:
    """Fuse per-component skeletons of the same original label
    (reference intake.py:587-593)."""
    merged = {}
    for segid, skels in skeletons.items():
        if len(skels) == 1:
            # every producer (batched finalize, paths_to_skeleton, host
            # fallback) emits already-consolidated skeletons
            skels[0].id = segid
            merged[segid] = skels[0]
            continue
        skel = Skeleton.simple_merge(skels)
        skel.id = segid
        merged[segid] = skel.consolidate()
    return merged


# --------------------------------------------------------------------------- #
# fix_borders: deterministic chunk-joining targets
# (reference intake.py:544-585, skeletontricks.pyx:528-760)


def _compute_centroids(cc_plane: np.ndarray, wx: float, wy: float) -> Dict[int, tuple]:
    """Per-label centroid on a 2D plane, rounded toward the plane center so
    every coordinate frame picks the same pixel (reference pyx:573-586).
    Vectorized over labels (single bincount pass)."""
    wx32, wy32 = np.float32(wx), np.float32(wy)
    sx, sy = cc_plane.shape
    cx = np.float32(wx32 * sx / 2)
    cy = np.float32(wy32 * sy / 2)

    xs, ys = np.nonzero(cc_plane)
    vals = cc_plane[xs, ys].astype(np.int64)
    if len(vals) == 0:
        return {}
    nl = int(vals.max()) + 1
    cnt = np.bincount(vals, minlength=nl).astype(np.float32)
    sx_sum = np.bincount(vals, weights=xs, minlength=nl)
    sy_sum = np.bincount(vals, weights=ys, minlength=nl)

    present = np.flatnonzero(cnt > 0)
    px = (wx32 * sx_sum[present].astype(np.float32) / cnt[present]).astype(np.float32)
    py = (wy32 * sy_sum[present].astype(np.float32) / cnt[present]).astype(np.float32)
    px = np.where(px - cx < 0, (px + wx32).astype(np.float32), px)
    py = np.where(py - cy < 0, (py + wy32).astype(np.float32), py)
    return {
        int(l): (float(a / wx32), float(b / wy32))
        for l, a, b in zip(present, px, py)
    }


def _distsq(p, q, wx, wy):
    dx = wx * (p[..., 0] - q[0])
    dy = wy * (p[..., 1] - q[1])
    return dx * dx + dy * dy


def find_border_targets(dt_plane: np.ndarray, cc_plane: np.ndarray, wx: float, wy: float):
    """Per 2D label: the max-EDT point, with the reference's 5-stage
    coordinate-frame-free tiebreak (closest to label centroid, then plane
    centroid, then corner, then edge, then first in y-major scan order;
    reference pyx:591-715). Bit-deterministic across chunk frames.
    Vectorized: one grouped lexsort over all max-EDT candidates."""
    sx, sy = dt_plane.shape
    centroids = _compute_centroids(cc_plane, wx, wy)
    cx, cy = np.float32(wx * sx / 2.0), np.float32(wy * sy / 2.0)

    flat_cc = cc_plane.ravel().astype(np.int64)
    flat_dt = dt_plane.ravel()
    fgm = (flat_cc > 0) & (flat_dt > 0)
    if not fgm.any():
        return {}
    nl = int(flat_cc[fgm].max()) + 1
    mx = np.zeros(nl, dtype=flat_dt.dtype)
    np.maximum.at(mx, flat_cc[fgm], flat_dt[fgm])

    cand_mask = fgm & (flat_dt == mx[flat_cc])
    idxs = np.flatnonzero(cand_mask)
    labs = flat_cc[idxs]
    xs = (idxs // sy).astype(np.float32)
    ys = (idxs % sy).astype(np.float32)

    centx = np.zeros(nl, dtype=np.float32)
    centy = np.zeros(nl, dtype=np.float32)
    for l, (a, b) in centroids.items():
        centx[l], centy[l] = float(int(a)), float(int(b))

    cand = np.stack([xs, ys], axis=1)
    dx = wx * (xs - centx[labs])
    dy = wy * (ys - centy[labs])
    k1 = dx * dx + dy * dy
    # NB: the reference compares against (wx*sx/2, wy*sy/2) expressed in
    # pixel units (pyx:694-696) — replicated verbatim for bit parity.
    k2 = _distsq(cand, (cx, cy), wx, wy)
    corners = [(-0.5, -0.5), (sx - 0.5, -0.5), (sx - 0.5, sy - 0.5), (-0.5, sx - 0.5)]
    k3 = np.min(np.stack([_distsq(cand, c, wx, wy) for c in corners]), axis=0)
    k4 = np.minimum.reduce(
        [
            wx * (xs - 0.5),
            wx * (sx - 0.5 - xs),
            wy * (ys - 0.5),
            wy * (sy - 0.5 - ys),
        ]
    )
    scan = ys * sx + xs  # y-major scan order (pyx:628-630)

    order = np.lexsort((scan, k4, k3, k2, k1, labs))
    labs_sorted = labs[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = labs_sorted[1:] != labs_sorted[:-1]
    winners = order[first]
    return {
        int(labs[w]): (int(xs[w]), int(ys[w])) for w in winners
    }


def _face_stack(cc):
    """The six border faces of a volume packed into one (11, P0, P1)
    zero-padded stack with zero separator planes between faces (26-conn
    CCL cannot merge across a zero plane). One device call + one fetch
    replaces six of each — the per-face loop paid ~5 tunnel roundtrips
    per face."""
    import jax.numpy as jnp

    sx, sy, sz = cc.shape
    P0, P1 = max(sx, sy), max(sy, sz)
    faces = [
        cc[:, :, 0], cc[:, :, -1],
        cc[:, 0, :], cc[:, -1, :],
        cc[0, :, :], cc[-1, :, :],
    ]
    stack = jnp.zeros((11, P0, P1), cc.dtype)
    for i, f in enumerate(faces):
        stack = stack.at[2 * i, : f.shape[0], : f.shape[1]].set(f)
    return stack


def compute_border_targets(cc_labels, anisotropy) -> Dict[int, np.ndarray]:
    """For each of the six faces: 2D CCL + 2D EDT + deterministic per-label
    max picks (reference intake.py:544-585). All six faces ride one
    batched CCL call and three batched EDT calls (one per anisotropy
    pair); padding with background is exact because a zero-label neighbor
    raises the same distance wall as `black_border`."""
    sx, sy, sz = cc_labels.shape

    face_meta = (
        ((sx, sy), (0, 1), lambda x, y: (x, y, 0)),
        ((sx, sy), (0, 1), lambda x, y: (x, y, sz - 1)),
        ((sx, sz), (0, 2), lambda x, z: (x, 0, z)),
        ((sx, sz), (0, 2), lambda x, z: (x, sy - 1, z)),
        ((sy, sz), (1, 2), lambda y, z: (0, y, z)),
        ((sy, sz), (1, 2), lambda y, z: (sx - 1, y, z)),
    )

    stack_dev = _face_stack(jnp.asarray(cc_labels))
    cc_stack_dev = connected_components(stack_dev)
    # fetch only the six face planes (even indices) — the separator rows
    # are zeros, and O(surface) fetches keep the sharded driver's
    # no-big-gather contract honest
    stack_np, cc_stack = (
        np.asarray(a)
        for a in jax.device_get((stack_dev[0::2], cc_stack_dev[0::2]))
    )

    # batched EDT per anisotropy pair: stacking along axis 0 with a huge
    # axis-0 weight leaves in-plane distances exact (any axis-0 step
    # exceeds every possible in-plane distance)
    dt_faces = [None] * 6
    for pair in ((0, 1), (2, 3), (4, 5)):
        idx = [2 * i for i in pair]
        if not cc_stack[list(pair)].any():
            continue
        dims = face_meta[pair[0]][1]
        wx = float(anisotropy[dims[0]])
        wy = float(anisotropy[dims[1]])
        sub = jnp.stack([cc_stack_dev[i] for i in idx])
        dt = np.asarray(jax.device_get(edt_ops.edt(
            sub, (1e9, wx, wy), black_border=True)))
        dt_faces[pair[0]], dt_faces[pair[1]] = dt[0], dt[1]

    target_list = defaultdict(set)

    for face_i, (fshape, dims, rotatefn) in enumerate(face_meta):
        if dt_faces[face_i] is None:
            continue
        wx, wy = float(anisotropy[dims[0]]), float(anisotropy[dims[1]])
        plane = stack_np[face_i, : fshape[0], : fshape[1]]
        if not plane.any():
            continue
        cc_raw = cc_stack[face_i, : fshape[0], : fshape[1]]
        # compact to 1..N preserving background = 0
        uniq, inv = np.unique(cc_raw, return_inverse=True)
        has_bg = len(uniq) > 0 and uniq[0] == 0
        new_vals = np.arange(len(uniq)) if has_bg else np.arange(1, len(uniq) + 1)
        cc_plane = new_vals[inv].reshape(plane.shape).astype(np.int32)

        dt_plane = dt_faces[face_i][: fshape[0], : fshape[1]]

        plane_targets = find_border_targets(dt_plane, cc_plane, wx, wy)

        # the target pixel itself carries the original cc_labels value
        for label, pt in plane_targets.items():
            orig = int(plane[pt[0], pt[1]])
            if orig == 0:
                continue
            target_list[orig].add(rotatefn(int(pt[0]), int(pt[1])))

    out = defaultdict(lambda: np.array([], dtype=np.uint32))
    for label, pts in target_list.items():
        out[label] = np.array(sorted(pts), dtype=np.uint32)
    return out


# --------------------------------------------------------------------------- #
# Hole filling (reference intake.py:747-794)


def fill_all_holes(cc_labels: np.ndarray, progress: bool = False,
                   return_fill_count: bool = False, vol_dev=None):
    """Fill interior holes of each connected component; labels that were
    holes are absorbed by the surrounding label.

    Hole masks for ALL labels are computed in vmapped per-crop-tier device
    batches from the pre-fill volume (ops.fill.fill_label_crops) — the
    reference's serial per-label form (intake.py:747-794) is replayed
    host-side over those masks, which is exact: an applied label's mask
    never changes under earlier labels' writes (a label with any voxel
    inside an earlier filled hole is absorbed and skipped; all other
    labels' voxel sets are untouched). `vol_dev` lets callers that already
    hold the volume on device skip the upload."""
    cc_labels = np.copy(cc_labels)
    labels = np.unique(cc_labels)
    labels_set = set(int(u) for u in labels if u != 0)

    all_slices = find_objects(cc_labels)
    pixels_filled = 0

    cand, offsets, shapes = [], [], []
    for label in labels:
        label = int(label)
        if label == 0 or all_slices[label - 1] is None:
            continue
        roi = Bbox.from_slices(all_slices[label - 1])
        cand.append(label)
        offsets.append(np.asarray(roi.minpt))
        shapes.append(np.asarray(roi.maxpt) - np.asarray(roi.minpt))

    if vol_dev is None:
        vol_dev = jnp.asarray(cc_labels)
    masks = fill_ops.fill_label_crops(
        vol_dev, np.asarray(offsets).reshape(-1, 3),
        np.asarray(shapes).reshape(-1, 3),
        np.asarray(cand, dtype=np.int64), cc_labels.shape)

    from tqdm import tqdm

    for label, (holes, n) in tqdm(list(zip(cand, masks)),
                                  disable=(not progress),
                                  desc="Filling Holes"):
        if label not in labels_set or n == 0:
            continue
        slices = all_slices[label - 1]
        pixels_filled += int(n)
        sub_labels = set(int(u) for u in np.unique(cc_labels[slices][holes]))
        sub_labels.discard(label)
        labels_set -= sub_labels
        cc_labels[slices] = np.where(holes, label, cc_labels[slices])

    if return_fill_count:
        return cc_labels, pixels_filled
    return cc_labels


# --------------------------------------------------------------------------- #
# Avocado protection (reference intake.py:600-704, skeletontricks.pyx:905-993)


def find_avocado_fruit(labels: np.ndarray, cx: int, cy: int, cz: int, background=0):
    """Cast 6 axis rays from (cx,cy,cz); if >=3 rays terminate on the same
    surrounding label (one mismatch allowed when more than 3 hits), classify
    (pit, fruit). Mirrors reference pyx:905-993."""
    sx, sy, sz = labels.shape
    if cx >= sx or cy >= sy or cz >= sz:
        raise ValueError(f"<{cx},{cy},{cz}> must be within <{sx},{sy},{sz}>")

    label = labels[cx, cy, cz]
    changes = []

    def ray(coords_iter, index_fn):
        for i in coords_iter:
            v = index_fn(i)
            if v == background:
                return None
            if v != label:
                return v
        return None

    rays = [
        ray(range(cx, sx), lambda x: labels[x, cy, cz]),
        ray(range(cx, 0, -1), lambda x: labels[x, cy, cz]),
        ray(range(cy, sy), lambda y: labels[cx, y, cz]),
        ray(range(cy, 0, -1), lambda y: labels[cx, y, cz]),
        ray(range(cz, sz), lambda z: labels[cx, cy, z]),
        ray(range(cz, 0, -1), lambda z: labels[cx, cy, z]),
    ]
    changes = [r for r in rays if r is not None]

    if len(changes) < 3:
        return (label, label)

    allowed_differences = 1 if len(changes) > 3 else 0
    uniq, cts = np.unique(changes, return_counts=True)
    candidate = int(np.argmax(cts))
    differences = len(changes) - cts[candidate]
    if differences > allowed_differences:
        return (label, label)
    return (label, uniq[candidate])


def _paint_walls(binimg: np.ndarray) -> np.ndarray:
    """2D-fill each wall so inclusions touching a wall are still treated as
    interior (reference intake.py:666-677)."""
    for axis in range(3):
        for side in (0, -1):
            idx = [slice(None)] * 3
            idx[axis] = side
            wall = binimg[tuple(idx)]
            binimg[tuple(idx)] = np.asarray(jax.device_get(fill_ops.fill(wall)))
    return binimg


def engage_avocado_protection(
    cc_labels, all_dbf, remapping, soma_detection_threshold, edtfn, progress=False
):
    orig_cc_labels = np.copy(cc_labels)
    cc_labels = np.copy(cc_labels)
    unchanged = set()

    from tqdm import trange

    for _ in trange(20, disable=(not progress), desc="Avocado Pass"):
        # nested-avocado cap (reference intake.py:610-614)
        candidates = set(
            int(u) for u in np.unique(
                cc_labels * (all_dbf > soma_detection_threshold / 2.5)
            )
        )
        candidates -= unchanged
        candidates.discard(0)

        cc_labels, unchanged_this_cycle, changes = _avocado_single_pass(
            cc_labels, all_dbf, candidates=sorted(candidates)
        )
        unchanged |= unchanged_this_cycle
        if len(changes) == 0:
            break
        all_dbf = edtfn(cc_labels)

    # renumber contiguously by first appearance in scan order and rebuild
    # the remapping (reference intake.py:636-644; fastremap.renumber orders
    # labels by first occurrence)
    uniq, first_idx, inv = np.unique(
        cc_labels, return_index=True, return_inverse=True
    )
    has_bg = len(uniq) > 0 and uniq[0] == 0
    fg = slice(1, None) if has_bg else slice(None)
    order = np.argsort(first_idx[fg], kind="stable")
    fg_new = np.empty(len(uniq) - (1 if has_bg else 0), dtype=np.int64)
    fg_new[order] = np.arange(1, len(fg_new) + 1)
    new_vals = np.concatenate([[0], fg_new]) if has_bg else fg_new
    new_cc = new_vals[inv].reshape(cc_labels.shape).astype(cc_labels.dtype)

    adjusted_remapping = {}
    flat_old = orig_cc_labels.reshape(-1)
    flat_new = new_cc.reshape(-1)
    # new cc id -> any old cc id occupying the same voxels -> original label
    seen = {}
    nz = flat_new != 0
    pairs = np.unique(np.stack([flat_new[nz], flat_old[nz]], axis=1), axis=0)
    for new_id, old_id in pairs:
        if int(new_id) not in seen and int(old_id) in remapping:
            seen[int(new_id)] = remapping[int(old_id)]
    adjusted_remapping = seen

    return new_cc, all_dbf, adjusted_remapping


def _avocado_single_pass(cc_labels, all_dbf, candidates):
    unchanged = set()
    changed = set()
    if len(candidates) == 0:
        return cc_labels, unchanged, changed

    slcs = find_objects(cc_labels)

    for label in candidates:
        slc = slcs[label - 1]
        if slc is None:
            continue
        offset = Bbox.from_slices(slc).minpt
        binimg = _paint_walls(cc_labels[slc] == label)
        masked = np.where(binimg, all_dbf[slc], 0.0)
        coord = np.unravel_index(np.argmax(masked), masked.shape)
        coord = tuple(int(c) + int(o) for c, o in zip(coord, offset))

        pit, fruit = find_avocado_fruit(cc_labels, *coord)
        if pit == fruit and pit not in changed:
            unchanged.add(int(pit))
        else:
            unchanged.discard(int(pit))
            unchanged.discard(int(fruit))
            changed.add(int(pit))
            changed.add(int(fruit))
            binimg |= cc_labels[slc] == fruit

        filled, n = fill_ops.fill(binimg, return_fill_count=True)
        filled = np.asarray(jax.device_get(filled))
        cc_labels[slc] = np.where(filled, fruit, cc_labels[slc])

    return cc_labels, unchanged, changed


# --------------------------------------------------------------------------- #
# Point utilities (reference intake.py:268-313,706-745)


def connect_points(
    labels,
    start,
    end,
    anisotropy=(1, 1, 1),
    fill_holes: bool = False,
    in_place: bool = False,
    pdrf_scale: float = 100000,
    pdrf_exponent: int = 4,
) -> Skeleton:
    """Extract a single centerline between two points of a binary image."""
    anisotropy = np.array(anisotropy, dtype=np.float32)
    start = tuple(int(c) for c in start)
    end = tuple(int(c) for c in end)

    labels = np.asarray(labels).astype(bool)
    labels = format_labels(labels, in_place=in_place)

    cc_labels, _ = compute_cc_labels(labels)
    start3 = (start + (0, 0, 0))[:3]
    end3 = (end + (0, 0, 0))[:3]
    if cc_labels[start3] == 0 or cc_labels[start3] != cc_labels[end3]:
        raise ValueError("Cannot extract centerline from disconnected components.")

    skel = trace_mod.point_to_point(
        labels, start3, end3,
        anisotropy=tuple(float(a) for a in anisotropy),
        pdrf_scale=pdrf_scale, pdrf_exponent=pdrf_exponent,
    )
    skel.vertices *= anisotropy
    skel.space = "physical"
    return skel


def synapses_to_targets(labels, synapses, progress: bool = False) -> Dict[tuple, int]:
    """Convert synapse centroids into in-label target voxels keyed by SWC
    label (reference intake.py:706-745)."""
    labels = np.asarray(labels)
    while labels.ndim > 3:
        labels = labels[..., 0]

    targets = {}
    for label, pairs in synapses.items():
        point_cloud = np.vstack((labels == label).nonzero()).T
        if len(point_cloud) == 0:
            continue
        swc_labels = defaultdict(list)
        for centroid, swc_label in pairs:
            swc_labels[swc_label].append(centroid)
        for swc_label, centroids in swc_labels.items():
            distances = scipy.spatial.distance.cdist(point_cloud, centroids)
            minima = np.unique(np.argmin(distances, axis=0))
            for idx in minima:
                targets[tuple(int(c) for c in point_cloud[idx])] = swc_label
    return targets


def print_quotes(parallel: int) -> None:
    """Easter-egg parity with reference intake.py:796-803."""
    if parallel == -1:
        print("Against the power of will I possess... The capability of my body is nothing.")
    elif parallel == -2:
        print("I will see the truth of this world... OROCHIMARU-SAMA WILL SHOW ME!!!")
    if -2 <= parallel < 0:
        print("CURSED SEAL OF THE EARTH!!!")
