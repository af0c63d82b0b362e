"""Multi-chip volume sharding for the skeletonization preamble.

The reference scales two ways: a POSIX-shm process pool over labels
(/root/reference/kimimaro/intake.py:344-432) and a zero-communication
chunked protocol for out-of-core volumes (README.md:389-409). On TPU the
analogues are:

  1. One chip already executes each label's field sweeps data-parallel, so
     the process pool disappears.
  2. Volumes exceeding one chip's HBM are sharded over a
     `jax.sharding.Mesh` and the field kernels communicate over ICI:
       - the multi-label EDT's pass along the sharded axis runs as a
         *ring min-plus*: each device keeps its slab of output lines and
         accumulates the parabola lower-envelope contribution of every
         other slab as the (distances, labels) blocks rotate around the
         ring via `ppermute` — the same schedule as ring attention, with
         min-plus replacing matmul;
       - the SSSP/flood sweeps exchange one boundary plane per round via
         `ppermute` halos;
       - connected-components labeling propagates min-ids through the same
         halos.
  3. Cross-pod/out-of-core scaling reuses the reference's own insight:
     fix_borders makes chunk results mergeable with zero runtime
     communication (kimimaro_tpu.intake.compute_border_targets +
     post.postprocess).

Everything here is shape-static and jit/shard_map friendly.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.edt import BIG, _axial_pass, _parabola_pass_banded
from ..ops.geodesic import OFFSETS26, _off_cost, _plane_offsets
from ..ops.stencils import graph_allows, shifted

INF = np.float32(np.inf)
AXIS = "shard"  # mesh axis name; the volume's leading dim is sharded over it


def make_mesh(n_devices: int) -> Mesh:
    """1D device mesh over the volume's leading axis. Falls back to the
    virtual CPU devices when the default backend has too few chips."""
    devs = jax.devices()
    if len(devs) < n_devices:
        cpu = jax.devices("cpu")
        if len(cpu) >= n_devices:
            devs = cpu
    return Mesh(np.array(devs[:n_devices]), (AXIS,))


def shard_volume(vol, mesh: Mesh):
    """Place a volume with its leading axis sharded over the mesh."""
    return jax.device_put(vol, NamedSharding(mesh, P(AXIS)))


# --------------------------------------------------------------------------- #
# Ring min-plus parabola pass (the sharded-axis EDT pass)


def _block_envelope(d_blk, l_blk, d_out, l_out, i_glob, j_glob, w,
                    w_blk=None, w_out=None):
    """min over j in the resident block of (g + w^2 (i - j)^2) for every
    local output position i; g = d_blk[j] when labels match else 0.

    d_blk/l_blk: (nb, L); d_out/l_out: (ni, L); i_glob: (ni,), j_glob: (nb,).
    w_blk/w_out: optional (nb, L)/(ni, L) int32 wall-segment indices
    (voxel_graph walls along the sharded axis): positions in different
    segments act like a label change (mutually invisible foreground, g=0),
    matching ops.edt._parabola_pass_banded's has_wall semantics.
    Returns the updated (ni, L) envelope.
    """
    has_wall = w_blk is not None
    # kernel (ni, nb)
    kern = (np.float32(w) ** 2) * (
        i_glob[:, None].astype(jnp.float32) - j_glob[None, :].astype(jnp.float32)
    ) ** 2

    # tile across L to bound the broadcast buffer (~32MB)
    L = d_out.shape[1]
    nb = d_blk.shape[0]
    ni = d_out.shape[0]
    chunk = max(1, min(L, (1 << 23) // max(1, ni * nb)))
    nchunks = -(-L // chunk)
    pad = nchunks * chunk - L

    def tile(x, fill, n_rows):
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)
        return x.reshape(n_rows, nchunks, chunk).transpose(1, 0, 2)

    d_b = tile(d_blk, BIG, nb)
    l_b = tile(l_blk, 0, nb)
    d_o = tile(d_out, BIG, ni)
    l_o = tile(l_out, 0, ni)
    if has_wall:
        w_b = tile(w_blk, 0, nb)
        w_o = tile(w_out, 0, ni)

    def one(args):
        if has_wall:
            db, lb, do, lo, wb, wo = args
        else:
            db, lb, do, lo = args
        same = lo[:, None, :] == lb[None, :, :]  # (ni, nb, chunk)
        if has_wall:
            same = same & (wo[:, None, :] == wb[None, :, :])
        g = jnp.where(same, db[None, :, :], 0.0)
        cand = jnp.min(g + kern[:, :, None], axis=1)  # (ni, chunk)
        return jnp.minimum(do, cand)

    args = (d_b, l_b, d_o, l_o, w_b, w_o) if has_wall else (d_b, l_b, d_o, l_o)
    out = jax.lax.map(one, args)  # (C, ni, chunk)
    out = out.transpose(1, 0, 2).reshape(ni, nchunks * chunk)[:, :L]
    return out


def _ring_parabola_pass(d, labels, w: float, black_border: bool, n_total: int,
                        n_dev: int, wall=None):
    """Exact parabola pass along the sharded leading axis, executed as a
    ring: blocks of (distances, labels) rotate across devices while each
    device folds their lower-envelope contribution into its own lines.

    d, labels: local shards (n_loc, n1, n2). `wall`: optional (n_loc, L)
    GLOBAL wall-segment indices along axis 0 (see sharded_edtsq).
    Runs inside shard_map.
    """
    has_wall = wall is not None
    n_loc = d.shape[0]
    L = d.shape[1] * d.shape[2]
    d2 = d.reshape(n_loc, L)
    l2 = labels.reshape(n_loc, L)

    my = jax.lax.axis_index(AXIS)
    i_glob = my * n_loc + jnp.arange(n_loc)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    out = jnp.full_like(d2, BIG)
    blk_d, blk_l, blk_w, blk_owner = d2, l2, wall, my

    for step in range(n_dev):
        j_glob = blk_owner * n_loc + jnp.arange(n_loc)
        out = _block_envelope(blk_d, blk_l, out, l2, i_glob, j_glob, w,
                              w_blk=blk_w, w_out=wall)
        if step + 1 < n_dev:
            blk_d = jax.lax.ppermute(blk_d, AXIS, perm)
            blk_l = jax.lax.ppermute(blk_l, AXIS, perm)
            if has_wall:
                blk_w = jax.lax.ppermute(blk_w, AXIS, perm)
            blk_owner = (blk_owner - 1) % n_dev

    out = jnp.minimum(out, d2)  # fold previous-pass distances

    if black_border:
        ii = i_glob.astype(jnp.float32)
        border = (np.float32(w) ** 2) * jnp.minimum(
            ii + 1.0, jnp.float32(n_total) - ii
        ) ** 2
        out = jnp.minimum(out, border[:, None])

    return out.reshape(d.shape)


_AXIS_UNIT = ((1, 0, 0), (0, 1, 0), (0, 0, 1))


@functools.lru_cache(maxsize=None)
def _edtsq_impl(mesh: Mesh, n0: int, anis, black_border: bool,
                has_vg: bool = False):
    """Cached jitted program: defining the shard_map closure per CALL made
    every invocation re-trace and re-compile (~10 s per call on the
    8-virtual-device CPU mesh); the cache keys the program on everything
    the closure captures so repeat calls hit the jit fast path."""
    n_dev = mesh.devices.size

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_rep=False,
    )
    def impl(lab, vg):
        d = jnp.full(lab.shape, BIG, dtype=jnp.float32)
        dummy_wall = jnp.zeros((1, 1), dtype=jnp.int32)

        # local passes along axes 1 and 2: exact axial run-boundary scan,
        # then a banded parabola pass (static band — shard_map cannot host
        # the escalation sync; 256 covers structures up to 256 voxels thick)
        first = True
        for axis in (1, 2):
            w = anis[axis]
            n = lab.shape[axis]
            if n == 1:
                if black_border:
                    d = jnp.minimum(d, np.float32(w) ** 2)
                continue
            lab_t = jnp.moveaxis(lab, axis, 0).reshape(n, -1)
            if has_vg:
                # wall-segment index per line (blocked +axis edges break
                # runs, exactly like ops.edt.edtsq's local form)
                allow = graph_allows(vg, _AXIS_UNIT[axis])
                allow_t = jnp.moveaxis(allow, axis, 0).reshape(n, -1)
                blocked = jnp.concatenate(
                    [jnp.zeros((1, lab_t.shape[1]), dtype=bool),
                     ~allow_t[:-1]], axis=0)
                wall = jnp.cumsum(blocked.astype(jnp.int32), axis=0)
            else:
                wall = dummy_wall
            if first:
                out = _axial_pass(lab_t, wall, w, bool(black_border),
                                  has_vg)
                first = False
            else:
                d_t = jnp.moveaxis(d, axis, 0).reshape(n, -1)
                out = _parabola_pass_banded(
                    d_t, lab_t, wall, w, bool(black_border),
                    min(n - 1, 256), has_vg,
                )
            out = out.reshape(jnp.moveaxis(d, axis, 0).shape)
            d = jnp.moveaxis(out, 0, axis)
            d = jnp.where(lab == 0, 0.0, d)

        # ring pass along the sharded axis 0
        wall0 = None
        if has_vg:
            # GLOBAL wall-segment index along axis 0: local cumsum of
            # blocked edges + per-line prefix of earlier shards' totals
            # (one all_gather), so segments match the unsharded cumsum
            n_loc = lab.shape[0]
            L = lab.shape[1] * lab.shape[2]
            allow0 = graph_allows(vg, _AXIS_UNIT[0]).reshape(n_loc, L)
            my = jax.lax.axis_index(AXIS)
            prev_allow = jax.lax.ppermute(
                allow0[-1:], AXIS,
                [(i, (i + 1) % n_dev) for i in range(n_dev)])
            prev_allow = jnp.where(my == 0, True, prev_allow)
            blocked = jnp.concatenate(
                [~prev_allow, ~allow0[:-1]], axis=0).astype(jnp.int32)
            local = jnp.cumsum(blocked, axis=0)
            totals = jax.lax.all_gather(local[-1], AXIS)  # (n_dev, L)
            prefix = jnp.sum(
                jnp.where(jnp.arange(n_dev)[:, None] < my, totals, 0),
                axis=0)
            wall0 = local + prefix[None, :]
        d = _ring_parabola_pass(d, lab, anis[0], bool(black_border), n0,
                                n_dev, wall=wall0)

        d = jnp.where(lab == 0, 0.0, d)
        return d

    return impl


def sharded_edtsq(
    labels,
    mesh: Mesh,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    black_border: bool = False,
    voxel_graph=None,
):
    """Multi-label anisotropic squared EDT with the volume sharded over the
    mesh's leading axis. Passes along unsharded axes are local
    (ops.edt._parabola_pass_banded); the sharded-axis pass is the ring
    min-plus. `voxel_graph`: optional cc3d-convention bitfield (sharded
    like the volume); blocked axis edges act as label boundaries exactly
    as in ops.edt.edtsq."""
    labels = jnp.asarray(labels)
    n0 = labels.shape[0]
    n_dev = mesh.devices.size
    assert n0 % n_dev == 0, "leading axis must divide evenly over the mesh"
    anis = tuple(float(a) for a in anisotropy)
    has_vg = voxel_graph is not None
    vg = (jnp.asarray(voxel_graph).astype(jnp.uint32) if has_vg
          else jnp.zeros((n_dev, 1, 1), dtype=jnp.uint32))  # unread dummy
    return _edtsq_impl(mesh, n0, anis, bool(black_border), has_vg)(
        labels, vg)


# --------------------------------------------------------------------------- #
# Halo-exchange directional sweeps (sharded SSSP / flood / invalidation)


def _halo_planes(x, n_dev):
    """Exchange boundary planes with ring neighbors. Returns (from_prev,
    from_next) planes of the same (1, n1, n2)-like shape."""
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    last = x[-1:]
    first = x[:1]
    from_prev = jax.lax.ppermute(last, AXIS, fwd)   # neighbor below's last plane
    from_next = jax.lax.ppermute(first, AXIS, bwd)  # neighbor above's first plane
    return from_prev, from_next


def sharded_distance_rounds(
    init_dist,
    ok_mask,
    mesh: Mesh,
    anisotropy: Sequence[float] = (1.0, 1.0, 1.0),
    node_cost=None,
    rounds: "int | None" = None,
    max_rounds: int = 0,
):
    """Six directional plane sweeps with cross-shard halo exchange on the
    leading axis. Within a shard one round extends every monotone geodesic
    fully; across shards information moves one shard boundary per round per
    direction. `rounds=None` (the default) iterates ON DEVICE to a global
    fixpoint: after each round every shard contributes a changed-flag that
    is psum'd over the mesh, so the while_loop stops exactly when no
    distance anywhere improved — exact SSSP regardless of shard count or
    path windiness. An integer `rounds` runs that fixed count (cheaper when
    the caller knows the topology). `max_rounds` bounds the fixpoint loop
    (0 -> a volume-diameter default)."""
    anis = tuple(float(a) for a in anisotropy)
    node_mode = node_cost is not None
    nc_in = node_cost if node_mode else jnp.zeros_like(init_dist)
    if max_rounds <= 0:
        max_rounds = int(sum(init_dist.shape)) + 8
    impl = _distance_impl(mesh, anis, node_mode, rounds, int(max_rounds))
    return impl(init_dist, jnp.asarray(ok_mask, dtype=bool), nc_in)


@functools.lru_cache(maxsize=None)
def _distance_impl(mesh: Mesh, anis, node_mode: bool, rounds, max_rounds: int):
    """Cached jitted sharded-sweep program (see _edtsq_impl's rationale)."""
    n_dev = mesh.devices.size

    def sweep(d, ok, nc, axis, direction, edge_plane):
        """Directional sweep along `axis`; for the sharded axis the
        incoming halo plane seeds the first step."""
        n = d.shape[axis]
        offs = _plane_offsets(axis, direction)
        plane_shifts = [
            (tuple(o[a] for a in range(3) if a != axis), _off_cost(o, anis))
            for o in offs
        ]
        dd = jnp.moveaxis(d, axis, 0)
        mm = jnp.moveaxis(ok, axis, 0)
        ncc = jnp.moveaxis(nc, axis, 0)
        if direction < 0:
            dd, mm, ncc = dd[::-1], mm[::-1], ncc[::-1]

        def relax(prev, cur, okc, ncur):
            cand = jnp.full_like(cur, INF)
            for po, c in plane_shifts:
                s = shifted(prev, po, INF)
                if node_mode:
                    cand = jnp.minimum(cand, s)
                else:
                    cand = jnp.minimum(cand, s + c)
            if node_mode:
                cand = cand + ncur
            return jnp.where(okc, jnp.minimum(cur, cand), INF)

        first = dd[0]
        if edge_plane is not None:
            first = relax(edge_plane[0], dd[0], mm[0], ncc[0])

        def step(prev, x):
            cur, okc, ncur = x
            new = relax(prev, cur, okc, ncur)
            return new, new

        _, rest = jax.lax.scan(step, first, (dd[1:], mm[1:], ncc[1:]))
        out = jnp.concatenate([first[None], rest], axis=0)
        if direction < 0:
            out = out[::-1]
        return jnp.moveaxis(out, 0, axis)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_rep=False,
    )
    def impl(d, ok, nc):
        d = jnp.where(ok, d, INF)

        def one_round(d):
            # sharded axis 0: halo in both directions
            from_prev, from_next = _halo_planes(d, n_dev)
            my = jax.lax.axis_index(AXIS)
            # devices at the ring edges must not wrap: mask the halo
            from_prev = jnp.where(my == 0, INF, from_prev)
            from_next = jnp.where(my == n_dev - 1, INF, from_next)
            d = sweep(d, ok, nc, 0, 1, from_prev)
            d = sweep(d, ok, nc, 0, -1, from_next)
            for axis in (1, 2):
                for direction in (1, -1):
                    d = sweep(d, ok, nc, axis, direction, None)
            return d

        if rounds is not None:
            def scanned(d, _):
                return one_round(d), None

            d, _ = jax.lax.scan(scanned, d, None, length=rounds)
            return d

        # fixpoint: iterate until no shard improves any distance
        def cond(state):
            _, live, i = state
            return live & (i < max_rounds)

        def body(state):
            d, _, i = state
            new = one_round(d)
            moved = jnp.any(new < d).astype(jnp.int32)
            live = jax.lax.psum(moved, AXIS) > 0
            return new, live, i + 1

        d, _, _ = jax.lax.while_loop(
            cond, body, (d, jnp.bool_(True), jnp.int32(0))
        )
        return d

    return impl


# --------------------------------------------------------------------------- #
# Sharded connected-components labeling (min-id propagation with halos)


def sharded_ccl_rounds(
    labels, mesh: Mesh, rounds: "int | None" = None, max_rounds: int = 0,
    voxel_graph=None,
):
    """26-connected multi-label CCL by min-linear-index propagation with
    one-plane halo exchange per round + local pointer jumping.

    `rounds=None` (default) iterates on device until the psum'd
    changed-flag over the mesh reports a global fixpoint — component ids
    are then exact for any topology. An integer runs a fixed count.
    `voxel_graph`: optional cc3d-convention bitfield (sharded like the
    volume) masking adjacency — the color_connectivity_graph analogue,
    same gating as ops.ccl.connected_components."""
    labels = jnp.asarray(labels)
    if max_rounds <= 0:
        max_rounds = int(sum(labels.shape)) + 8
    has_vg = voxel_graph is not None
    vg = (jnp.asarray(voxel_graph).astype(jnp.uint32) if has_vg
          else jnp.zeros((int(mesh.devices.size), 1, 1), dtype=jnp.uint32))
    return _ccl_impl(mesh, rounds, int(max_rounds), has_vg)(labels, vg)


@functools.lru_cache(maxsize=None)
def _ccl_impl(mesh: Mesh, rounds, max_rounds: int, has_vg: bool = False):
    """Cached jitted sharded-CCL program (see _edtsq_impl's rationale)."""
    n_dev = mesh.devices.size

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_rep=False,
    )
    def impl(lab, vg):
        my = jax.lax.axis_index(AXIS)
        shape = lab.shape
        n_loc = shape[0]
        fg = lab != 0
        base = (my * n_loc) * (shape[1] * shape[2])
        lin = (
            jnp.arange(1, lab.size + 1, dtype=jnp.int32).reshape(shape) + base
        )
        ids = jnp.where(fg, lin, 0)

        def one_round(ids):
            # halo exchange of boundary planes (ids and labels)
            fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            prev_ids = jax.lax.ppermute(ids[-1:], AXIS, fwd)
            next_ids = jax.lax.ppermute(ids[:1], AXIS, bwd)
            prev_lab = jax.lax.ppermute(lab[-1:], AXIS, fwd)
            next_lab = jax.lax.ppermute(lab[:1], AXIS, bwd)
            prev_ids = jnp.where(my == 0, 0, prev_ids)
            next_ids = jnp.where(my == n_dev - 1, 0, next_ids)

            ids_ext = jnp.concatenate([prev_ids, ids, next_ids], axis=0)
            lab_ext = jnp.concatenate([prev_lab, lab, next_lab], axis=0)
            if has_vg:
                prev_vg = jax.lax.ppermute(vg[-1:], AXIS, fwd)
                next_vg = jax.lax.ppermute(vg[:1], AXIS, bwd)
                vg_ext = jnp.concatenate([prev_vg, vg, next_vg], axis=0)

            best = ids
            for off in OFFSETS26:
                nb_ids = shifted(ids_ext, off, 0)[1:-1]
                nb_lab = shifted(lab_ext, off, 0)[1:-1]
                okn = fg & (nb_lab == lab) & (nb_ids > 0) & (nb_ids < best)
                if has_vg:
                    # bit at the NEIGHBOR voxel for the step back toward
                    # this voxel (same convention as ops.ccl._ccl_stage)
                    neg = tuple(-c for c in off)
                    okn = okn & shifted(
                        graph_allows(vg_ext, neg), off, False)[1:-1]
                best = jnp.where(okn, nb_ids, best)

            # local pointer jumping (only ids resident in this shard)
            lo = base
            hi = base + ids.size

            def jump(v):
                flat = v.ravel()
                local = (v > lo) & (v <= hi)
                idx = jnp.clip(v - 1 - lo, 0, ids.size - 1).ravel()
                hop = flat[idx].reshape(v.shape)
                return jnp.where(local & (hop > 0), jnp.minimum(v, hop), v)

            return jump(jump(best))

        if rounds is not None:
            def scanned(ids, _):
                return one_round(ids), None

            ids, _ = jax.lax.scan(scanned, ids, None, length=rounds)
            return ids

        # fixpoint: min-ids only ever decrease; stop when no shard moved
        def cond(state):
            _, live, i = state
            return live & (i < max_rounds)

        def body(state):
            ids, _, i = state
            new = one_round(ids)
            moved = jnp.any(new != ids).astype(jnp.int32)
            live = jax.lax.psum(moved, AXIS) > 0
            return new, live, i + 1

        ids, _, _ = jax.lax.while_loop(
            cond, body, (ids, jnp.bool_(True), jnp.int32(0))
        )
        return ids

    return impl


# --------------------------------------------------------------------------- #
# The sharded preamble "step" (drives dryrun_multichip)


def preamble_step(
    labels,
    mesh: Mesh,
    anisotropy: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    pdrf_scale: float = 100000.0,
    pdrf_exponent: int = 4,
    sweep_rounds: "int | None" = None,
    ccl_rounds: "int | None" = None,
):
    """One full sharded preamble pass: multi-label EDT (ring pass over the
    mesh) -> PDRF penalty field (fused elementwise) -> CCL to fixpoint ->
    distance sweeps to fixpoint (None = converge exactly via the psum'd
    changed-flag; integers run fixed counts). This is the compute body that
    a multi-chip skeletonization iterates; `__graft_entry__.dryrun_multichip`
    jits it over an N-device mesh."""
    labels = jnp.asarray(labels)

    dsq = sharded_edtsq(labels, mesh, anisotropy, black_border=False)
    dbf = jnp.sqrt(dsq)

    dbf_max = jnp.maximum(jnp.max(dbf), 1e-6)
    m = 1.0 / dbf_max**1.01
    dbf_inf = jnp.where(dbf == 0, INF, dbf)
    p = 1.0 - dbf_inf * m
    e = int(pdrf_exponent)
    while e > 1:  # powers of two
        p = p * p
        e >>= 1
    pdrf = p * pdrf_scale

    cc = sharded_ccl_rounds(labels, mesh, rounds=ccl_rounds)

    # distance field seeded at the global DBF argmax (a root proxy)
    flat_idx = jnp.argmax(dbf)
    init = jnp.where(
        jnp.arange(labels.size).reshape(labels.shape) == flat_idx, 0.0, INF
    ).astype(jnp.float32)
    daf = sharded_distance_rounds(
        init, labels != 0, mesh, anisotropy, rounds=sweep_rounds
    )

    return {"dbf": dbf, "pdrf": pdrf, "cc": cc, "daf": daf}
