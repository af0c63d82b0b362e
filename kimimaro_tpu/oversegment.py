"""Skeleton-guided oversegmentation.

TPU-native rebuild of /root/reference/kimimaro/utility.py:562-644: per
label, a multi-source geodesic distance field seeded at the (optionally
downsampled) skeleton vertices assigns every voxel to its nearest vertex
(Voronoi-style territories), producing a composite label map renumbered
from 1 plus a per-vertex `segments` attribute. The dijkstra3d
euclidean_distance_field(return_feature_map=True) call is replaced by the
device sweep kernel ops.geodesic.voronoi_feature_field.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Tuple, Union

import numpy as np

import jax

from .ops.geodesic import voronoi_feature_field
from .skeleton import Skeleton
from .utility import add_property
from .xsection import shape_iterator

SEGMENTS_PROP = {
    "id": "segments",
    "data_type": "uint64",
    "num_components": 1,
}


def oversegment(
    all_labels: np.ndarray,
    skeletons: Union[Dict[int, Skeleton], List[Skeleton], Skeleton],
    anisotropy=np.array([1, 1, 1], dtype=np.float32),
    progress: bool = False,
    fill_holes: bool = False,
    in_place: bool = False,
    downsample: int = 0,
) -> Tuple[np.ndarray, Union[Dict[int, Skeleton], List[Skeleton], Skeleton]]:
    """Split pre-existing labels into per-skeleton-vertex territories."""
    anisotropy = np.asarray(anisotropy, dtype=np.float32)
    skeletons = copy.deepcopy(skeletons)

    if hasattr(skeletons, "vertices"):
        skeleton_list = [skeletons]
    elif isinstance(skeletons, dict):
        skeleton_list = list(skeletons.values())
    else:
        skeleton_list = skeletons

    all_labels = np.asarray(all_labels)
    all_features = np.zeros(all_labels.shape, dtype=np.uint64)
    next_label = 0

    def helper(skel, binimg, roi):
        nonlocal next_label

        segment_skel = skel
        if downsample > 0:
            segment_skel = skel.downsample(downsample)

        vertices = (segment_skel.vertices / anisotropy).round().astype(int)
        vertices = vertices - roi.minpt
        shape = np.array(binimg.shape)
        inb = np.all((vertices >= 0) & (vertices < shape), axis=1)
        vertices = vertices[inb]
        if vertices.shape[0] == 0:
            return

        _, feature_map = voronoi_feature_field(
            binimg, vertices, tuple(float(a) for a in anisotropy)
        )
        feature_map = np.asarray(jax.device_get(feature_map)).astype(np.uint64)

        add_property(skel, SEGMENTS_PROP)

        feature_map[binimg] += next_label
        next_label += vertices.shape[0]
        all_features[roi.to_slices()] += feature_map

    shape_iterator(all_labels, skeletons, fill_holes, in_place, progress, helper)

    # renumber composite by first appearance (fastremap.renumber semantics)
    uniq, first_idx, inv = np.unique(
        all_features, return_index=True, return_inverse=True
    )
    has_bg = len(uniq) > 0 and uniq[0] == 0
    fg = slice(1, None) if has_bg else slice(None)
    order = np.argsort(first_idx[fg], kind="stable")
    fg_new = np.empty(len(uniq) - (1 if has_bg else 0), dtype=np.uint64)
    fg_new[order] = np.arange(1, len(fg_new) + 1, dtype=np.uint64)
    new_vals = (
        np.concatenate([[np.uint64(0)], fg_new]) if has_bg else fg_new
    )
    all_features = new_vals[inv].reshape(all_features.shape)

    for skel in skeleton_list:
        vertices = (skel.vertices / anisotropy).round().astype(int)
        shape = np.array(all_features.shape)
        vertices = np.clip(vertices, 0, shape - 1)
        skel.segments = all_features[
            vertices[:, 0], vertices[:, 1], vertices[:, 2]
        ]

    return all_features, skeletons
