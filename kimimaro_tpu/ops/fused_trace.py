"""Fully fused on-device TEASAR path loop.

The host-orchestrated loop in kimimaro_tpu.trace dispatches ~5 device calls
per path (argmax, relax, parent fetch, invalidation, rezero), which makes
per-label latency dispatch-bound. This kernel runs the ENTIRE path loop
(reference semantics: /root/reference/kimimaro/trace.py:196-267) as one
`lax.while_loop` inside one jit:

  per path: pick target (manual stack or masked DAF argmax)
         -> pointer-chase the shortest-path tree of the rail distance field
            (scalar 3x3x3 window walks, no full parent-field materialized)
         -> soma-radius culling
         -> multi-source capped relaxation = rolling-ball invalidation
         -> zero the PDRF along the path (new rails) and warm-relax the
            rail distance field (distances only decrease, so the
            almost-converged field refixes in a couple of sweep rounds)

Paths are written into a static (K, L, 3) buffer; an overflow flag tells
the host to fall back to the host loop (never observed in practice — K and
L are sized from max_paths and the crop perimeter).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stencils import offset_costs

INF = np.float32(np.inf)


# Default static sweep-round counts. Rounds needed = number of "bends" in
# the worst geodesic; compact shapes converge in a handful. Unconverged
# lanes are FLAGGED (not silently wrong) and escalated by the caller.
#
# NB: these loops were originally `lax.while_loop(any(nd != d))` fixpoints.
# On TPU (axon) that program miscompiles: standalone it hangs the worker,
# and under vmap with B >= 8 lanes the loop exits early, leaving the field
# unconverged (observed: every lane's rail chase then wanders for the full
# path buffer). Static-trip-count fori_loop + an explicit convergence
# check compiles correctly everywhere and is also kinder to the scheduler.
RELAX_ROUNDS = int(os.environ.get("KIMIMARO_TPU_RELAX_ROUNDS", "6"))


def _relax_rounds(d, ok, nc, anisotropy, rounds: int, clamp_positive=False,
                  voxel_graph=None, conv: str = "exact"):
    """Run `rounds` full 6-sweep rounds (static trip count) plus one
    checking round. Returns (d, converged: bool scalar).

    conv — the convergence criterion, matched to what the caller consumes:
      "exact":    d2 == d everywhere (full value fixpoint).
      "reach":    the finite set stalled. Sound for reachability consumers:
                  an INF voxel next to any finite voxel becomes finite the
                  very next round, so a full no-growth round means no INF
                  voxel has a finite neighbor -> stable forever.
      "negative": the <= 0 set and its values stalled. Sound for
                  clamp_positive ball consumers: positives are clamped to
                  INF, so candidates derive solely from the negative set;
                  if that set and its values repeat, so does every future
                  round.

    Always the scan form (pallas=False): this runs inside vmapped engine
    kernels, where the Pallas grid would serialize the batch dimension.
    `voxel_graph` (optional, cc3d bit convention) blocks individual edges —
    self-touch walls (reference dijkstra_invalidation.hpp:150-191).
    """

    # ONE custom-batching boundary around the whole round loop: under the
    # engine's vmap this lowers to the batched Pallas relax with hoisted
    # ok/nc layouts and flip-free descending sweeps. voxel_graph rides
    # into the Pallas kernels as a uint32 operand (per-layout GRAPH_BITS),
    # so self-touch volumes batch at full lane width too.
    from .geodesic import relax_rounds_batchable

    return relax_rounds_batchable(
        d, ok, nc, anisotropy, rounds, clamp_positive, conv,
        voxel_graph=voxel_graph,
    )


def _relax_fixpoint(d, ok, nc, anisotropy, clamp_positive=False,
                    voxel_graph=None, rounds: int = RELAX_ROUNDS):
    """Bounded-round relaxation, discarding the convergence flag (callers
    that track convergence use _relax_rounds directly)."""
    out, _ = _relax_rounds(d, ok, nc, anisotropy, rounds, clamp_positive,
                           voxel_graph)
    return out


# bit index authorizing a downhill chase step cur -> cur+o for each 3x3x3
# window position: the relaxation edge ran (cur+o) -> cur, i.e. movement
# from the neighbor along -o, so the neighbor's bit for -o must be set
# (cc3d convention: bit k at voxel v permits leaving v along offset k).
def _chase_bit_table():
    from .stencils import GRAPH_BITS

    bits = np.full((27,), 31, dtype=np.int32)  # 31 = never-set dummy
    for k in range(27):
        o = (k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1)
        if o == (0, 0, 0):
            continue
        bits[k] = GRAPH_BITS[(-o[0], -o[1], -o[2])]
    return bits


_CHASE_BITS = _chase_bit_table()


def _chase(d_pad, start, max_len: int, vg_pad=None):
    """Walk the shortest-path tree from `start` to the nearest rail
    (d == 0): at each voxel step to the 26-neighbor minimizing the rail
    distance (first-minimum tie break in lexicographic offset order,
    matching the host parent_field). `vg_pad` (optional, zero-padded
    voxel_graph) forbids steps across blocked edges. Returns (path (L,3)
    int32 with -1 padding, length, reached_rail)."""
    L = max_len
    chase_bits = jnp.asarray(_CHASE_BITS, dtype=jnp.uint32)

    def cond(state):
        i, cur, path, done = state
        return (~done) & (i < L)

    def body(state):
        i, cur, path, done = state
        path = path.at[i].set(cur)
        dcur = d_pad[cur[0] + 1, cur[1] + 1, cur[2] + 1]
        at_rail = dcur <= 0.0

        win = jax.lax.dynamic_slice(d_pad, (cur[0], cur[1], cur[2]), (3, 3, 3))
        flat = win.reshape(27).at[13].set(INF)
        if vg_pad is not None:
            vg_win = jax.lax.dynamic_slice(
                vg_pad, (cur[0], cur[1], cur[2]), (3, 3, 3)
            ).reshape(27)
            open_edge = ((vg_win >> chase_bits) & 1) > 0
            flat = jnp.where(open_edge, flat, INF)
        k = jnp.argmin(flat)
        off = jnp.stack([k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1])
        nxt = cur + off.astype(jnp.int32)
        cur = jnp.where(at_rail, cur, nxt)
        return i + 1, cur, path, done | at_rail

    path0 = jnp.full((L, 3), -1, dtype=jnp.int32)
    i, cur, path, done = jax.lax.while_loop(
        cond, body, (jnp.int32(0), start.astype(jnp.int32), path0, jnp.bool_(False))
    )
    return path, i, done


@functools.partial(
    jax.jit,
    static_argnames=(
        "anisotropy", "fix_branching", "soma_mode", "K", "L", "relax_rounds",
    ),
)
def fused_path_loop(
    fg,
    valid,
    dbf,
    daf,
    pdrf,
    root,
    before_targets,  # (T, 3) int32, padded
    n_before,
    after_targets,   # (T, 3) int32, padded
    n_after,
    scale,
    const,
    soma_radius,
    max_paths,
    anisotropy: Tuple[float, float, float],
    fix_branching: bool,
    soma_mode: bool,
    K: int,
    L: int,
    relax_rounds: int = RELAX_ROUNDS,
):
    """Run the whole TEASAR path loop on device.

    Returns (paths (K,L,3) int32 -1-padded, path_lens (K,), n_paths,
    overflow flag). Non-convergence of any internal relaxation (bounded
    static rounds) is folded into the overflow flag -> caller escalates.
    """
    shape = fg.shape
    anis = jnp.asarray(anisotropy, dtype=jnp.float32)
    r_main = int(relax_rounds)
    # balls are near-convex and the rail re-relax starts warm, so they
    # run shorter than the main fields — but not so short that escalation
    # retries dominate (measured on the dense 512^3: ball=2/warm=1 retried
    # 30% of jobs; ball=6/warm=4 retried 0.1%)
    r_ball = max(3, r_main // 2)
    r_warm = max(2, r_main // 3)

    # initial rail = root
    pdrf = pdrf.at[root[0], root[1], root[2]].set(0.0)
    d0 = jnp.full(shape, INF, dtype=jnp.float32)
    d0 = d0.at[root[0], root[1], root[2]].set(0.0)
    d_rail, conv0 = _relax_rounds(d0, fg, pdrf, anisotropy, r_main)

    valid_count = jnp.sum(valid).astype(jnp.int32)

    paths0 = jnp.full((K, L, 3), -1, dtype=jnp.int32)
    lens0 = jnp.zeros((K,), dtype=jnp.int32)

    def cond(state):
        (k, valid, valid_count, pdrf, d_rail, nb, na, paths, lens, overflow) = state
        work = (valid_count > 0) | (nb > 0) | (na > 0)
        return work & (k < jnp.minimum(max_paths, K)) & (~overflow)

    def body(state):
        (k, valid, valid_count, pdrf, d_rail, nb, na, paths, lens, overflow) = state

        # --- target selection (reference trace.py:225-230)
        use_before = nb > 0
        use_after = (~use_before) & (valid_count == 0)
        masked = jnp.where(valid, daf, -INF)
        am = jnp.argmax(masked)
        auto_t = jnp.stack(jnp.unravel_index(am, shape)).astype(jnp.int32)
        bt = before_targets[jnp.maximum(nb - 1, 0)]
        at = after_targets[jnp.maximum(na - 1, 0)]
        target = jnp.where(use_before, bt, jnp.where(use_after, at, auto_t))
        nb = jnp.where(use_before, nb - 1, nb)
        na = jnp.where(use_after, na - 1, na)

        # --- chase to the nearest rail
        d_pad = jnp.pad(d_rail, 1, constant_values=INF)
        path, plen, reached = _chase(d_pad, target, L)
        overflow = overflow | (~reached)

        # --- soma culling (reference trace.py:246-251): drop vertices
        # within soma_radius of the root, keeping the rail anchor (the
        # last recorded vertex)
        if soma_mode:
            dvec = (path.astype(jnp.float32) - root.astype(jnp.float32)) * anis
            dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=1))
            idx = jnp.arange(L)
            is_anchor = idx == (plen - 1)
            keep = (dist > soma_radius) | is_anchor
            keep = keep & (idx < plen)
            path = jnp.where(keep[:, None], path, -1)

        px, py, pz = path[:, 0], path[:, 1], path[:, 2]

        # --- rolling-ball invalidation (reference trace.py:253-259)
        radii = scale * dbf.at[px, py, pz].get(mode="fill", fill_value=0.0) + const
        init = jnp.full(shape, INF, dtype=jnp.float32)
        init = init.at[px, py, pz].min(-radii, mode="drop")
        # expand over still-valid voxels plus the (possibly invalidated)
        # sources themselves
        ok_inv = valid.at[px, py, pz].set(True, mode="drop")
        def invalidate(_):
            ball_d, conv_b = _relax_rounds(init, ok_inv, None, anisotropy,
                                           r_ball, clamp_positive=True,
                                           conv="negative")
            ball = ball_d <= 0.0
            n_inv = jnp.sum(ball & valid).astype(jnp.int32)
            return valid & ~ball, valid_count - n_inv, conv_b
        valid, valid_count, conv_b = jax.lax.cond(
            valid_count > 0, invalidate,
            lambda _: (valid, valid_count, jnp.bool_(True)), None
        )
        overflow = overflow | (~conv_b)

        # --- new rails (reference trace.py:261-263)
        if fix_branching:
            pdrf = pdrf.at[px, py, pz].set(0.0, mode="drop")
            d_rail = d_rail.at[px, py, pz].set(0.0, mode="drop")
            d_rail, conv_w = _relax_rounds(d_rail, fg, pdrf, anisotropy,
                                           r_warm)
            overflow = overflow | (~conv_w)

        paths = paths.at[k].set(path)
        lens = lens.at[k].set(plen)
        return (k + 1, valid, valid_count, pdrf, d_rail, nb, na, paths, lens,
                overflow)

    state = (jnp.int32(0), valid, valid_count, pdrf, d_rail,
             n_before.astype(jnp.int32), n_after.astype(jnp.int32),
             paths0, lens0, ~conv0)
    state = jax.lax.while_loop(cond, body, state)
    (k, valid, valid_count, pdrf, d_rail, nb, na, paths, lens, overflow) = state

    # work remaining because K was too small also counts as overflow
    work_left = (valid_count > 0) | (nb > 0) | (na > 0)
    overflow = overflow | (work_left & (k >= K) & (k < max_paths))
    return paths, lens, k, overflow
