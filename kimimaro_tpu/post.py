"""Skeleton postprocessing / chunk-merge repair.

TPU-native framework rebuild of /root/reference/kimimaro/post.py. Skeleton
graphs are tiny (10^2-10^5 nodes) so this stage is host-side numpy/scipy —
the reference's C++ helpers (find_cycle, create_distance_graph,
skeletontricks.hpp:209-394) are reimplemented as plain python over edge
arrays, which profiling shows is negligible next to the device field sweeps.

Pipeline (reference post.py:49-87):
  consolidate -> remove_dust -> remove_loops ->
  join_close_components(restrict_by_radius) -> remove_ticks
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.spatial import cKDTree as KDTree

from .skeleton import Skeleton


def postprocess(
    skeleton: Skeleton,
    dust_threshold: float = 1500.0,
    tick_threshold: float = 3000.0,
) -> Skeleton:
    """Aggregate adjacent/overlapping skeletonized chunks into one coherent
    skeleton: drop dust components, break loops, join close components,
    remove small ticks (reference post.py:49-87)."""
    label = skeleton.id
    skeleton = skeleton.consolidate()
    skeleton = remove_dust(skeleton, dust_threshold)
    skeleton = remove_loops(skeleton)
    skeleton = join_close_components(skeleton, restrict_by_radius=True)
    skeleton = remove_ticks(skeleton, tick_threshold)
    skeleton.id = label
    return skeleton.consolidate()


# --------------------------------------------------------------------------- #
# Component joining (reference post.py:89-218)


def join_close_components(
    skeletons, radius: float = np.inf, restrict_by_radius: bool = False
) -> Skeleton:
    """Greedily fuse the closest pair of connected components via their two
    nearest vertices, repeating until nothing is within `radius` (or within
    r1+r2 when radius-restricted)."""
    if radius is None:
        radius = np.inf
    if radius <= 0:
        raise ValueError(f"radius must be greater than zero: {radius}")

    if isinstance(skeletons, Skeleton):
        skeletons = [skeletons]

    skels: List[Skeleton] = []
    for skeleton in skeletons:
        skels += skeleton.components()
    skels = [s.consolidate() for s in skels if not s.empty()]

    if len(skels) == 1:
        return skels[0]
    if len(skels) == 0:
        return Skeleton()

    if restrict_by_radius:
        radius = 2 * max(float(np.max(s.radii)) for s in skels)
        radius = max(radius, 0.0)

    N = len(skels)
    dist_matrix = np.full((N, N), np.inf, dtype=np.float32)
    index_matrix = np.full((N, N, 2), np.iinfo(np.uint32).max, dtype=np.uint32)

    def compute_nearest(tree, i, j):
        s1, s2 = skels[i], skels[j]
        r, idx = tree.query(s2.vertices, k=1, distance_upper_bound=radius + 1e-6)
        idx_s2 = int(np.argmin(r))
        idx_s1 = int(idx[idx_s2]) if np.isfinite(r[idx_s2]) else 0
        local = float(r[idx_s2])

        if (
            restrict_by_radius
            and np.isfinite(local)
            and local > (s1.radii[idx_s1] + s2.radii[idx_s2])
        ):
            local = np.inf

        dist_matrix[i, j] = dist_matrix[j, i] = local
        index_matrix[i, j] = (idx_s1, idx_s2)

    for i in range(N):
        tree = KDTree(skels[i].vertices)
        for j in range(i + 1, N):
            compute_nearest(tree, i, j)

    def symmetric_delete(matrix, k):
        matrix = np.delete(matrix, k, axis=0)
        return np.delete(matrix, k, axis=1)

    while len(skels) > 1:
        min_d = np.min(dist_matrix)
        if np.isinf(min_d) or min_d > radius:
            break

        i, j = np.unravel_index(np.argmin(dist_matrix), dist_matrix.shape)
        if index_matrix[i, j, 0] == np.iinfo(np.uint32).max:
            i, j = j, i  # only the upper-triangle entry holds indices
        s1, s2 = skels[i], skels[j]
        fused = Skeleton.simple_merge([s1, s2])
        fused.edges = np.concatenate(
            [
                fused.edges,
                [[index_matrix[i, j, 0], index_matrix[i, j, 1] + s1.vertices.shape[0]]],
            ]
        ).astype(np.uint32)

        skels = [fused] + [s for k, s in enumerate(skels) if k not in (i, j)]

        lo, hi = min(i, j), max(i, j)
        dist_matrix = symmetric_delete(dist_matrix, lo)
        dist_matrix = symmetric_delete(dist_matrix, hi - 1)
        index_matrix = symmetric_delete(index_matrix, lo)
        index_matrix = symmetric_delete(index_matrix, hi - 1)

        N = len(skels)
        dm = np.full((N, N), np.inf, dtype=np.float32)
        dm[1:, 1:] = dist_matrix
        dist_matrix = dm
        im = np.full((N, N, 2), np.iinfo(np.uint32).max, dtype=np.uint32)
        im[1:, 1:] = index_matrix
        index_matrix = im

        tree = KDTree(skels[0].vertices)
        for j in range(1, N):
            compute_nearest(tree, 0, j)

    return Skeleton.simple_merge(skels).consolidate()


# --------------------------------------------------------------------------- #
# Dust (reference post.py:222-233)


def remove_dust(skeleton: Skeleton, dust_threshold: float) -> Skeleton:
    """Remove connected components with cable length below the threshold."""
    if skeleton.empty() or dust_threshold == 0:
        return skeleton
    skels = [
        s for s in skeleton.components() if s.cable_length() > dust_threshold
    ]
    return Skeleton.simple_merge(skels)


# --------------------------------------------------------------------------- #
# Cycle detection (reference skeletontricks.hpp:209-298)


def find_cycle(edges: np.ndarray) -> np.ndarray:
    """Find one cycle in an undirected edge list via iterative DFS.

    Returns a closed walk [a, x1, ..., a] as int32, or an empty array if the
    graph is acyclic. Deterministic: adjacency explored in sorted order.
    Uses the native C++ kernel (kimimaro_tpu.native) when available.
    """
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if edges.shape[0] == 0:
        return np.zeros((0,), dtype=np.int32)

    try:
        from . import native

        out = native.find_cycle(edges)
        if out is not None:
            return out
    except Exception:
        pass

    index = defaultdict(set)
    for e1, e2 in edges:
        index[int(e1)].add(int(e2))
        index[int(e2)].add(int(e1))

    root = int(edges[0, 0])
    stack = [root]
    parents = [-1]
    depth_stack = [0]
    path: List[int] = []
    visited = set()
    node = -1

    found = False
    while stack:
        node = stack.pop()
        parent = parents.pop()
        depth = depth_stack.pop()

        while len(path) > depth:
            path.pop()
        path.append(node)

        if node in visited:
            found = True
            break
        visited.add(node)

        for child in sorted(index[node]):
            if child == parent:
                continue
            stack.append(child)
            parents.append(node)
            depth_stack.append(depth + 1)

    if not found or len(path) <= 1:
        return np.zeros((0,), dtype=np.int32)

    # trim the lead-in before the first occurrence of the repeated node
    i = 0
    for i in range(len(path) - 1):
        if path[i] == node:
            break
    if len(path) - i < 3:
        return np.zeros((0,), dtype=np.int32)
    return np.array(path[i:], dtype=np.int32)


# --------------------------------------------------------------------------- #
# Loop removal (reference post.py:436-563)


def remove_loops(skeleton: Skeleton) -> Skeleton:
    if skeleton.empty():
        return skeleton
    skels = [_remove_loops(c) for c in skeleton.components()]
    return Skeleton.simple_merge(skels).consolidate(
        remove_disconnected_vertices=False
    )


def _remove_loops(skeleton: Skeleton) -> Skeleton:
    """Break every cycle using the reference's branch-count case analysis
    (post.py:446-563): 0 branch points -> delete loop; 1 -> delete + re-edge
    to the farthest loop node; 2 -> remove the shorter arc; 3+ -> collapse to
    the centroid-nearest node unless the "stargate" radius check fails, in
    which case snip a single edge."""
    nodes = skeleton.vertices
    edges = np.copy(skeleton.edges).astype(np.int32)

    while True:
        cycle_path = find_cycle(edges)
        if len(cycle_path) == 0:
            break

        edges_cycle = path2edge(cycle_path).astype(np.uint32)
        edges_cycle.sort(axis=1)

        nodes_cycle = np.unique(edges_cycle).astype(np.int32)

        unique_nodes, unique_counts = np.unique(edges, return_counts=True)
        branch_nodes = unique_nodes[unique_counts >= 3]
        branch_cycle = nodes_cycle[np.isin(nodes_cycle, branch_nodes)].astype(np.int32)

        if branch_cycle.shape[0] == 1:
            branch_point = nodes[branch_cycle, :]
            cycle_points = nodes[nodes_cycle, :]
            dist = np.sum((cycle_points - branch_point) ** 2, axis=1)
            end_node = nodes_cycle[np.argmax(dist)]

            edges = remove_row(edges, edges_cycle)
            new_edge = np.array([[branch_cycle[0], end_node]], dtype=np.int32)
            edges = np.concatenate((edges, new_edge), 0)

        elif branch_cycle.shape[0] == 2:
            path = np.array(cycle_path[1:])
            pos = np.where(np.isin(path, branch_cycle))[0]
            if (pos[1] - pos[0]) < len(path) / 2:
                path = path[pos[0]: pos[1] + 1]
            else:
                path = np.concatenate((path[pos[1]:], path[: pos[0] + 1]), 0)

            edge_path = path2edge(path)
            edge_path.sort(axis=1)

            row_valid = np.ones(edges_cycle.shape[0])
            for i in range(edge_path.shape[0]):
                row_valid -= (edges_cycle[:, 0] == edge_path[i, 0]) * (
                    edges_cycle[:, 1] == edge_path[i, 1]
                )
            edge_path = edges_cycle[row_valid.astype(bool), :]
            edges = remove_row(edges, edge_path)

        elif branch_cycle.shape[0] == 0:
            edges = remove_row(edges, edges_cycle)

        else:
            branch_points = nodes[branch_cycle, :]
            centroid = np.mean(branch_points, axis=0)
            dist = np.sum((nodes - centroid) ** 2, axis=1)
            intersect_node = int(np.argmin(dist))
            intersect_point = nodes[intersect_node, :]

            dist = np.sqrt(np.max(np.sum((branch_points - intersect_point) ** 2, 1)))

            # "stargate" fix (reference post.py:541-547)
            if dist > skeleton.radii[intersect_node]:
                edges = remove_row(edges, edges_cycle[:1, :])
                continue

            edges = remove_row(edges, edges_cycle)
            new_edges = np.zeros((branch_cycle.shape[0], 2))
            new_edges[:, 0] = branch_cycle
            new_edges[:, 1] = intersect_node
            if np.isin(intersect_node, branch_cycle):
                idx = np.where(branch_cycle == intersect_node)
                new_edges = np.delete(new_edges, idx, 0)
            edges = np.concatenate((edges, new_edges), 0)

    skeleton.vertices = nodes
    skeleton.edges = edges.astype(np.uint32)
    return skeleton


# --------------------------------------------------------------------------- #
# Tick removal (reference post.py:235-434)


def create_distance_graph(skeleton: Skeleton) -> Dict[Tuple[int, int], float]:
    """Distance "supergraph" between critical points (terminals + branch
    points) of a single connected component (reference post.py:364-434 /
    skeletontricks.hpp:303-394). Uses the native C++ kernel when
    available."""
    vertices = skeleton.vertices
    edges = skeleton.edges

    try:
        from . import native

        out = native.create_distance_graph(vertices, edges)
        if out is not None:
            return out
    except Exception:
        pass

    unique_nodes, unique_counts = np.unique(edges, return_counts=True)
    terminal_nodes = unique_nodes[unique_counts == 1]
    branch_nodes = set(int(n) for n in unique_nodes[unique_counts >= 3])

    critical_points = set(int(n) for n in terminal_nodes)
    critical_points.update(branch_nodes)

    tree = defaultdict(set)
    for e1, e2 in edges:
        tree[int(e1)].add(int(e2))
        tree[int(e2)].add(int(e1))

    if len(terminal_nodes) == 0:
        return {}

    start = int(terminal_nodes[0])
    stack = [start]
    parents = [-1]
    dist_stack = [0.0]
    root_stack = [start]
    distgraph: Dict[Tuple[int, int], float] = defaultdict(float)
    max_steps = 4 * edges.shape[0] + 16  # guards against cyclic inputs
    steps = 0

    while stack:
        steps += 1
        if steps > max_steps:
            raise ValueError("create_distance_graph: graph contains a cycle")
        node = stack.pop()
        dist = dist_stack.pop()
        root = root_stack.pop()
        parent = parents.pop()

        if node in critical_points and node != root:
            distgraph[(root, node)] = dist
            dist = 0.0
            root = node

        for child in tree[node]:
            if child != parent:
                stack.append(child)
                parents.append(node)
                dist_stack.append(
                    dist + float(np.linalg.norm(vertices[node] - vertices[child]))
                )
                root_stack.append(root)

    return dict(distgraph)


def remove_ticks(skeleton: Skeleton, threshold: float) -> Skeleton:
    """Remove terminal branches shorter than `threshold`, shortest first,
    re-fusing degree-2 joints as they appear (reference post.py:235-362)."""
    if skeleton.empty() or threshold == 0:
        return skeleton
    skels = [_remove_ticks(c, threshold) for c in skeleton.components()]
    return Skeleton.simple_merge(skels).consolidate(
        remove_disconnected_vertices=False
    )


def _remove_ticks(skeleton: Skeleton, threshold: float) -> Skeleton:
    if skeleton.empty():
        return skeleton

    import networkx as nx

    dgraph = create_distance_graph(skeleton)
    edges = skeleton.edges

    unique_nodes, unique_counts = np.unique(edges, return_counts=True)
    terminal_nodes = set(int(n) for n in unique_nodes[unique_counts == 1])

    branch_counts = defaultdict(int)
    for n, c in zip(unique_nodes, unique_counts):
        if c >= 3:
            branch_counts[int(n)] = int(c)

    G = nx.Graph()
    G.add_edges_from(edges)

    terminal_superedges = set(
        e for e in dgraph.keys() if (e[0] in terminal_nodes or e[1] in terminal_nodes)
    )

    def fuse_edge(joint):
        unify = [e for e in dgraph.keys() if joint in e]
        new_dist = 0.0
        for e in unify:
            terminal_superedges.discard(e)
            new_dist += dgraph[e]
            del dgraph[e]
        nodes = set(n for e in unify for n in e)
        nodes.remove(joint)
        key = tuple(nodes)
        dgraph[key] = new_dist
        terminal_superedges.add(key)
        branch_counts[joint] = 0

    while len(dgraph) > 1:
        if not terminal_superedges:
            break
        min_edge = min(terminal_superedges, key=dgraph.get)
        e1, e2 = min_edge

        if branch_counts[e1] == 1 and branch_counts[e2] == 1:
            break
        if dgraph[min_edge] >= threshold:
            break

        path = nx.shortest_path(G, e1, e2)
        path = [(path[i], path[i + 1]) for i in range(len(path) - 1)]
        G.remove_edges_from(path)

        del dgraph[min_edge]
        terminal_superedges.remove(min_edge)
        branch_counts[e1] -= 1
        branch_counts[e2] -= 1

        if branch_counts[e1] == 2:
            fuse_edge(e1)
        if branch_counts[e2] == 2:
            fuse_edge(e2)

    skel = skeleton.clone()
    skel.edges = np.array(list(G.edges), dtype=np.uint32).reshape(-1, 2)
    return skel


# --------------------------------------------------------------------------- #
# Edge-row helpers (reference post.py:565-601)


def path2edge(path) -> np.ndarray:
    """Sequence of nodes -> (N-1, 2) consecutive edge array."""
    path = np.asarray(path)
    edges = np.zeros([len(path) - 1, 2], dtype=np.uint32)
    edges[:, 0] = path[:-1]
    edges[:, 1] = path[1:]
    return edges


def remove_row(array: np.ndarray, rows2remove: np.ndarray) -> np.ndarray:
    array = np.copy(array)
    array.sort(axis=1)
    if array.size == 0:
        return array.astype(np.int32, copy=False)

    rows2remove = np.copy(rows2remove)
    rows2remove.sort(axis=1)

    for i in range(rows2remove.shape[0]):
        idx = find_row(array, rows2remove[i, :])
        if np.sum(idx == -1) == 0:
            array = np.delete(array, idx, axis=0)

    return array.astype(np.int32, copy=False)


def find_row(array: np.ndarray, row) -> np.ndarray:
    """Indices of rows of `array` equal to `row` (-1 semantics as reference
    post.py:590-601)."""
    matches = (array[:, 0] == row[0]) & (array[:, 1] == row[1])
    idx = np.where(matches)
    if len(idx) == 0:
        return -1
    return idx[0]
