import gzip, struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
L = raw[2077:501870]
keys = L[16+4*2523+4*512:]
u = np.frombuffer(keys[1:], '<u2').astype(np.int64)
s = np.frombuffer(keys[1:], '<i2').astype(np.int64)
n = len(u)
print("n u16", n, "odd?", n % 2)

ev = u[0::2]; od = u[1::2]
sev = s[0::2]; sod = s[1::2]
print("sum even (u16):", ev.sum(), " +count:", ev.sum() + len(ev))
print("sum odd (u16):", od.sum())
print("576391 vs", ev.sum(), od.sum())
print("even frac small(<256):", (ev < 256).mean(), "odd frac small:", (od < 256).mean())
print("even frac negative(i16):", (sev < 0).mean(), "odd:", (sod < 0).mean())
# where does even break 'small'? list first 20 break positions
br = np.flatnonzero(ev >= 256)
print("n even>=256:", len(br), "first:", br[:20])
print("even large values:", ev[br[:20]])
# 512^3 related sums
print("sum all u16:", u.sum())
print("sum odd signed:", sod.sum(), "sum even signed:", sev.sum())
# maybe records are variable: value>=32768 means 2-word value?
hi = (u >= 32768)
print("frac hi", hi.mean())
# count of even-values == 0
print("even zeros:", (ev == 0).sum(), "odd zeros:", (od == 0).sum())
# Are large even values followed by structure? print context around first breaks
for b in br[:6]:
    i = b * 2
    print("ctx", i, ":", list(s[max(0, i-6):i+8]))
