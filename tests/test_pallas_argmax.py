"""Equivalence of the Pallas streamed crop-argmax (ops.pallas_argmax) with
the XLA gather form (gengine._crop_argmax + _unflatten_crop).

The contract both engines rely on (cross-engine bit-equality of target
selection, reference kimimaro/trace.py:225-230 + skeletontricks.pyx
995-1045): the FIRST maximum of the masked field in global (x, y, z)
lexicographic order. Fixtures force ties, all-masked lanes, +inf values,
clamped window origins, and crops larger than one VMEM slab."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kimimaro_tpu.ops import pallas_argmax
from kimimaro_tpu.gengine import _crop_argmax, _unflatten_crop


@pytest.fixture(autouse=True)
def _interpret():
    pallas_argmax.INTERPRET = True
    yield
    pallas_argmax.INTERPRET = False


def _reference(packed, cc16, offs, lids, crop):
    idx, val = _crop_argmax(packed, cc16, offs, lids, crop)
    coords = _unflatten_crop(idx, offs, crop)
    return np.asarray(coords), np.asarray(val)


def _run_both(packed_np, cc_np, offs_np, lids_np, crop):
    packed = jnp.asarray(packed_np, dtype=jnp.float32)
    cc = jnp.asarray(cc_np, dtype=jnp.uint16)
    offs = jnp.asarray(offs_np, dtype=jnp.int32)
    lids = jnp.asarray(lids_np, dtype=jnp.int32)
    want_c, want_v = _reference(packed, cc, offs, lids, crop)
    got_c, got_v = pallas_argmax.crop_argmax(packed, cc, offs, lids, crop)
    got_c, got_v = np.asarray(got_c), np.asarray(got_v)
    # values must agree everywhere (including -inf empty lanes)
    np.testing.assert_array_equal(want_v, got_v)
    # coords must agree wherever a maximum exists
    has = np.isfinite(want_v) | np.isposinf(want_v)
    np.testing.assert_array_equal(want_c[has], got_c[has])


def test_random_labels_with_ties():
    # Each label confined to a block that fits the crop (the engines'
    # precondition: a label's bbox fits its gather crop tier). Quantized
    # field forces frequent ties; the first-in-lex-order pick must match
    # argmax-over-ravel exactly.
    rng = np.random.RandomState(3)
    shape = (24, 22, 20)
    crop = (12, 10, 8)
    cc = np.zeros(shape, dtype=np.uint16)
    blocks = {1: (0, 2, 1), 2: (11, 3, 11), 3: (2, 12, 10), 4: (12, 12, 2)}
    for lid, o in blocks.items():
        sl = tuple(slice(s, s + c) for s, c in zip(o, crop))
        cc[sl] = np.where(rng.rand(*crop) < 0.6, lid, cc[sl])
    packed = rng.randint(0, 4, size=shape).astype(np.float32)
    packed[cc == 0] = -np.inf
    offs, lids = [], []
    for lid in (1, 2, 3, 4):
        pos = np.argwhere(cc == lid)
        mn = pos.min(axis=0)
        off = np.minimum(mn, np.asarray(shape) - np.asarray(crop))
        offs.append(np.maximum(off, 0))
        lids.append(lid)
    _run_both(packed, cc, np.asarray(offs), np.asarray(lids), crop)


def test_empty_and_inf_lanes():
    shape = (16, 16, 16)
    cc = np.zeros(shape, dtype=np.uint16)
    cc[2:6, 2:6, 2:6] = 1
    packed = np.full(shape, -np.inf, dtype=np.float32)
    packed[cc == 1] = 1.0
    packed[3, 3, 3] = np.inf  # unreached foreground rides +inf
    offs = np.asarray([[0, 0, 0], [0, 0, 0], [8, 8, 8]])
    lids = np.asarray([1, 7, 0])  # 7: absent label; 0: padding lane
    crop = (8, 8, 8)
    _run_both(packed, cc, offs, lids, crop)


def test_clamped_origin_and_multislab():
    rng = np.random.RandomState(11)
    shape = (40, 21, 19)  # non-multiple-of-8/128 axes force Y/Z widening
    cc = (rng.rand(*shape) < 0.5).astype(np.uint16)
    packed = rng.rand(*shape).astype(np.float32) * 100
    packed[cc == 0] = -np.inf
    crop = (40, 21, 19)  # whole volume; origin clamps to 0
    offs = np.zeros((4, 3), dtype=np.int64)
    lids = np.asarray([1, 1, 1, 0])
    old = pallas_argmax._SLAB_BYTES
    pallas_argmax._SLAB_BYTES = 1 << 16  # force several slabs per lane
    try:
        _run_both(packed, cc, offs, lids, crop)
    finally:
        pallas_argmax._SLAB_BYTES = old


def test_offset_alignment_widening():
    """Origins off the 8/128 grid: the widened window may include same-
    label voxels left of the requested origin only if the bbox does —
    here bboxes fit the crop so results must be identical."""
    rng = np.random.RandomState(5)
    shape = (32, 40, 30)
    cc = np.zeros(shape, dtype=np.uint16)
    cc[5:12, 9:17, 11:21] = 1
    cc[20:30, 21:37, 3:13] = 2
    holes = rng.rand(*shape) < 0.3
    holes[6:11, 10:16, 12:20] = False
    holes[21:29, 22:36, 4:12] = False
    cc[holes] = 0
    packed = np.where(cc > 0, rng.rand(*shape) * 10, -np.inf).astype(
        np.float32)
    crop = (12, 16, 10)
    offs = np.asarray([[5, 9, 11], [20, 21, 3]])
    lids = np.asarray([1, 2])
    _run_both(packed, cc, offs, lids, crop)
