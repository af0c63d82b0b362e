import gzip
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = raw[501870:514166]
stream = np.frombuffer(mid[4:], 'u1')
bits = np.unpackbits(stream, bitorder='little')
ones = np.flatnonzero(bits)
vals = (np.diff(np.concatenate([[-1], ones])) - 1).astype(np.int64)
print("nvals", len(vals))

# are all large values preceded by a zero?
big = np.flatnonzero(vals > 47)
print("n>47:", len(big))
pre0 = vals[big - 1]
print("frac preceded by 0:", (pre0 == 0).mean())
print("sample big (prev, val, next):", [(int(vals[i-1]), int(vals[i]), int(vals[i+1])) for i in big[:10]])

# scheme B: 0 = escape, next value = run of unchanged rows
def schemeB(vals, run_bias):
    rows = 0; i = 0; updates = 0
    while i < len(vals):
        if vals[i] == 0:
            if i + 1 >= len(vals): rows += 1; i += 1; continue
            rows += vals[i + 1] + run_bias
            i += 2
        else:
            rows += 1; updates += 1; i += 1
    return rows, updates

for bias in [0, 1, 2]:
    print("schemeB bias", bias, schemeB(vals, bias))

# scheme C: value v: if v < T -> delta row; if v >= T -> run of (v-T+1) rows
for T in [40, 47, 48]:
    rows = ((vals < T).sum() + (vals[vals >= T] - T + 1).sum())
    print(f"schemeC T{T}: rows {rows}")

# scheme D: alternate pairs (run, delta) strictly
ev = vals[0::2]; od = vals[1::2]
print("schemeD rows:", ev.sum() + len(od), "| evens max", ev.max())
