"""TPU micro-benchmark + equivalence: pallas_argmax.crop_argmax vs the
XLA gather form (gengine._crop_argmax). Run on a QUIET host:

  python notes/micro_pallas_argmax.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kimimaro_tpu.ops import pallas_argmax
from kimimaro_tpu.gengine import _crop_argmax, _unflatten_crop

print("backend:", jax.default_backend(), jax.devices()[0].platform)

rng = np.random.RandomState(0)
shape = (512, 512, 512)
N_LABELS = 512  # confined-block labels (precondition: bbox <= crop)
CROP = (96, 96, 96)
LANES = 2048  # the dense workload's hot tier width

cc = np.zeros(shape, dtype=np.uint16)
offs_list = []
for lid in range(1, N_LABELS + 1):
    o = rng.randint(0, 512 - 96, size=3)
    sz = rng.randint(40, 96, size=3)
    sl = tuple(slice(a, a + s) for a, s in zip(o, sz))
    block = cc[sl]
    m = rng.rand(*block.shape) < 0.5
    block[m & (block == 0)] = lid
    cc[sl] = block
    offs_list.append(o)

packed_np = np.where(cc > 0, rng.rand(*shape) * 100, -np.inf).astype(
    np.float32)

offs = np.asarray(offs_list, dtype=np.int32)
lids = np.arange(1, N_LABELS + 1, dtype=np.int32)
# pad to the 2048-lane tier with dead lanes, like the engine does
pad = LANES - N_LABELS
offs = np.concatenate([offs, np.zeros((pad, 3), np.int32)])
lids = np.concatenate([lids, np.zeros(pad, np.int32)])

packed_d = jnp.asarray(packed_np)
cc_d = jnp.asarray(cc)
offs_d = jnp.asarray(offs)
lids_d = jnp.asarray(lids)

# --- equivalence on device
idx, val_x = _crop_argmax(packed_d, cc_d, offs_d, lids_d, CROP)
coord_x = _unflatten_crop(idx, offs_d, CROP)
coord_p, val_p = pallas_argmax.crop_argmax(packed_d, cc_d, offs_d, lids_d,
                                           CROP)
val_x, val_p = np.asarray(val_x), np.asarray(val_p)
coord_x, coord_p = np.asarray(coord_x), np.asarray(coord_p)
np.testing.assert_array_equal(val_x, val_p)
has = np.isfinite(val_x)
np.testing.assert_array_equal(coord_x[has], coord_p[has])
print(f"equivalence OK over {int(has.sum())} live lanes")


def timeit(fn, n=10):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


tx = timeit(lambda: _crop_argmax(packed_d, cc_d, offs_d, lids_d, CROP))
tp = timeit(lambda: pallas_argmax.crop_argmax(packed_d, cc_d, offs_d,
                                              lids_d, CROP))
print(f"XLA gather form : {tx*1e3:8.2f} ms")
print(f"Pallas streamed : {tp*1e3:8.2f} ms   ({tx/tp:.2f}x)")
