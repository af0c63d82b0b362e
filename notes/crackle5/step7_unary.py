import gzip
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = raw[501870:514166]
stream = np.frombuffer(mid[4:], 'u1')
bits = np.unpackbits(stream, bitorder='little')
# unary sense0: runs of zeros terminated by 1 -> value = run length
ones = np.flatnonzero(bits)
vals = np.diff(np.concatenate([[-1], ones])) - 1
print("count", len(vals), "tail bits after last 1:", len(bits) - 1 - ones[-1])
print("hist:", np.bincount(vals)[:40])
print("max", vals.max())
print("first 120:", list(vals[:120]))
print("last 40:", list(vals[-40:]))
# look at pair structure
if len(vals) % 2 == 0:
    pairs = vals.reshape(-1, 2)
    print("pair hist (first val):", np.bincount(pairs[:, 0])[:16])
# are there 16384 separators of some value?
for sep in range(0, 30):
    print(f"count of value {sep}: {(vals == sep).sum()}")
