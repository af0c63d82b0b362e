"""Compressed in-memory label volumes (the CrackleArray capability).

The reference keeps 512^3+ segmentations out of host RAM with crackle
compressed arrays and uses them lazily: `.connected_components`,
`.voxel_counts`, `.decompress(label, crop)`, `.bounding_boxes`
(reference utility.py:63-92, intake.py:459, 528). The crackle codec does
not exist in this environment, so this module provides the same
*capability* with a transparent container: labels are stored as
independently zlib-compressed z-slabs (label volumes compress 10-50x)
and decompressed lazily, per slab.

Interplay with the pipeline:
  * `skeletonize(CompressedLabelVolume)` works — intake materializes only
    for upload, and the chunked driver (`chunked.skeletonize_chunked`)
    slices slab-by-slab so peak host RAM stays ~one chunk.
  * `voxel_counts()` / `bounding_boxes()` / `unique()` stream one slab at
    a time.
  * `decompress(label, crop)` extracts a single label's binary mask over
    its bounding box without touching other slabs.
"""

from __future__ import annotations

import zlib
from typing import Dict, Optional, Tuple

import numpy as np


class CompressedLabelVolume:
    """zlib-per-slab compressed 3D integer volume with lazy slicing."""

    def __init__(self, arr: np.ndarray, slab: int = 16, level: int = 1):
        arr = np.asarray(arr)
        while arr.ndim < 3:
            arr = arr[..., np.newaxis]
        assert arr.ndim == 3, "CompressedLabelVolume holds 3D volumes"
        self.shape = arr.shape
        self.dtype = arr.dtype
        self.slab = int(slab)
        self._slabs = []
        for z0 in range(0, arr.shape[2], self.slab):
            chunk = np.ascontiguousarray(arr[:, :, z0: z0 + self.slab])
            self._slabs.append(
                (chunk.shape, zlib.compress(chunk.tobytes(), level))
            )
        self._counts: Optional[Dict[int, int]] = None
        self._bboxes: Optional[Dict[int, Tuple[np.ndarray, np.ndarray]]] = None

    # --- basic protocol -------------------------------------------------

    @property
    def nbytes_compressed(self) -> int:
        return sum(len(b) for _, b in self._slabs)

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * self.dtype.itemsize

    def __len__(self) -> int:
        return self.shape[0]

    @property
    def size(self) -> int:
        return int(np.prod(self.shape))

    @property
    def ndim(self) -> int:
        return 3

    def _slab_arr(self, i: int) -> np.ndarray:
        shape, blob = self._slabs[i]
        return np.frombuffer(
            zlib.decompress(blob), dtype=self.dtype
        ).reshape(shape)

    def slabs(self):
        """Iterate (z0, labels_slab) decompressing one slab at a time."""
        for i in range(len(self._slabs)):
            yield i * self.slab, self._slab_arr(i)

    def __array__(self, dtype=None, copy=None):
        out = self.to_numpy()
        return out.astype(dtype) if dtype is not None else out

    def to_numpy(self) -> np.ndarray:
        out = np.empty(self.shape, dtype=self.dtype)
        for z0, sl in self.slabs():
            out[:, :, z0: z0 + sl.shape[2]] = sl
        return out

    def __getitem__(self, key) -> np.ndarray:
        """Slice like a numpy array, decompressing only the needed slabs."""
        if not isinstance(key, tuple):
            key = (key,)
        key = key + (slice(None),) * (3 - len(key))
        zk = key[2]
        if isinstance(zk, slice):
            z0, z1, zstep = zk.indices(self.shape[2])
        else:
            z0, z1, zstep = int(zk), int(zk) + 1, 1
        lo = max(min(z0, z1), 0)
        hi = min(max(z0, z1 + 1), self.shape[2]) if zstep < 0 else min(z1, self.shape[2])
        if zstep < 0:
            lo, hi = 0, self.shape[2]  # reverse slices: take everything
        i0, i1 = lo // self.slab, max((hi - 1) // self.slab, lo // self.slab)
        parts = [self._slab_arr(i) for i in range(i0, i1 + 1)]
        block = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=2)
        base = i0 * self.slab
        if isinstance(zk, slice):
            zk2 = slice(
                None if zk.start is None else zk.start - base,
                None if zk.stop is None else zk.stop - base,
                zk.step,
            )
        else:
            zk2 = int(zk) - base
        return block[key[0], key[1], zk2]

    # --- crackle-parity lazy metadata ------------------------------------

    def _scan(self) -> None:
        """One vectorized pass per slab: counts and per-label bboxes via
        unique(return_inverse) + per-axis min/max scatters (O(voxels),
        no per-label rescans)."""
        counts: Dict[int, int] = {}
        mins: Dict[int, np.ndarray] = {}
        maxs: Dict[int, np.ndarray] = {}
        for z0, sl in self.slabs():
            u, inv, c = np.unique(sl, return_inverse=True,
                                  return_counts=True)
            inv = inv.ravel()
            nx, ny, nz = sl.shape
            gx, gy, gz = np.meshgrid(
                np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
            k = len(u)
            mn = np.full((k, 3), np.iinfo(np.int64).max, dtype=np.int64)
            mx = np.full((k, 3), -1, dtype=np.int64)
            for a, g in enumerate((gx, gy, gz)):
                gf = g.ravel()
                np.minimum.at(mn[:, a], inv, gf)
                np.maximum.at(mx[:, a], inv, gf)
            mn[:, 2] += z0
            mx[:, 2] += z0
            for j, lab in enumerate(u.tolist()):
                counts[lab] = counts.get(lab, 0) + int(c[j])
                if lab in mins:
                    mins[lab] = np.minimum(mins[lab], mn[j])
                    maxs[lab] = np.maximum(maxs[lab], mx[j])
                else:
                    mins[lab], maxs[lab] = mn[j], mx[j]
        self._counts = counts
        self._bboxes = {k: (mins[k], maxs[k]) for k in mins}

    def voxel_counts(self) -> Dict[int, int]:
        """{label: voxel count} (reference intake.py:196 CrackleArray use)."""
        if self._counts is None:
            self._scan()
        return dict(self._counts)

    def bounding_boxes(self) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """{label: (min_corner, max_corner inclusive)}
        (reference utility.py:92)."""
        if self._bboxes is None:
            self._scan()
        return dict(self._bboxes)

    def unique(self) -> np.ndarray:
        return np.array(sorted(self.voxel_counts().keys()), dtype=self.dtype)

    def decompress(self, label: int, crop: bool = True) -> Tuple[np.ndarray, Optional[tuple]]:
        """Binary mask of one label; with crop=True only its bounding box
        is materialized (reference intake.py:459). Returns (mask, slices)
        where slices locate the crop in the full volume (None uncropped)."""
        if crop:
            bb = self.bounding_boxes().get(int(label))
            if bb is None:
                return np.zeros((0, 0, 0), dtype=bool), None
            mn, mx = bb
            slc = tuple(slice(int(a), int(b) + 1) for a, b in zip(mn, mx))
            return self[slc] == label, slc
        return self.to_numpy() == label, None

    def remap(self, mapping: Dict[int, int], preserve_missing_labels: bool = True):
        """Relabel in compressed space (reference intake.py:528 .remap).
        Fully vectorized: the mapping becomes a sorted key/value pair of
        arrays once, and each slab relabels with two searchsorted passes —
        no per-voxel (or per-unique) Python."""
        keys = np.fromiter(mapping.keys(), dtype=np.int64,
                           count=len(mapping))
        vals = np.fromiter(mapping.values(), dtype=np.int64,
                           count=len(mapping))
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]

        out = CompressedLabelVolume.__new__(CompressedLabelVolume)
        out.shape, out.dtype, out.slab = self.shape, self.dtype, self.slab
        out._counts = out._bboxes = None
        out._slabs = []
        for i in range(len(self._slabs)):
            sl = self._slab_arr(i)
            flat = sl.ravel().astype(np.int64)
            pos = np.searchsorted(keys, flat)
            pos_c = np.minimum(pos, max(len(keys) - 1, 0))
            hit = (len(keys) > 0) & (keys[pos_c] == flat)
            miss = flat if preserve_missing_labels else 0
            new = np.where(hit, vals[pos_c] if len(keys) else 0, miss)
            sl = new.astype(self.dtype).reshape(sl.shape)
            out._slabs.append((sl.shape, zlib.compress(sl.tobytes(), 1)))
        return out
