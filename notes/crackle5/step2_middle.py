import gzip, struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = raw[501870:514166]
a, b = struct.unpack('<II', mid[:8])
print("a", a, hex(a))
print("b", b, hex(b), "bytes", mid[4:8].hex())
body = np.frombuffer(mid[8:], 'u1')
print("body len", len(body))
print("byte hist head:", np.bincount(body, minlength=256)[:16])
print("frac zero bytes", (body == 0).mean())
vals, counts = np.unique(body, return_counts=True)
p = counts / counts.sum()
print("byte entropy", -(p * np.log2(p)).sum(), "distinct", len(vals))

# hypothesis A: 512 x 24-byte per-slice records
rec = body.reshape(512, 24)
u32s = rec.view('<u4').reshape(512, 6)
u16s = rec.view('<u2').reshape(512, 12)
print("\nper-slice u32 cols: min/max/monotonic")
for c in range(6):
    col = u32s[:, c].astype(np.int64)
    mono = np.all(np.diff(col) >= 0)
    print(f"col{c}: min {col.min()} max {col.max()} mono {mono} first5 {col[:5]}")
zidx = np.frombuffer(raw[29:29+4*512], '<u4').astype(np.int64)
cz = np.frombuffer(raw[2077+16+4*2523:2077+16+4*2523+4*512], '<u4').astype(np.int64)
print("corr with zidx:", [round(float(np.corrcoef(u32s[:, c], zidx)[0, 1]), 3) for c in range(6)])
print("corr with cz:", [round(float(np.corrcoef(u32s[:, c], cz)[0, 1]), 3) for c in range(6)])
print("u16 col ranges:", [(int(u16s[:, c].min()), int(u16s[:, c].max())) for c in range(12)])

# hypothesis B: bitstream stats
bits = np.unpackbits(body, bitorder='little')
print("\nones frac (lsb)", bits.mean())
# hypothesis C: 6-bit values < 24 (permutation index)
for name, bo in [("lsb", 'little'), ("msb", 'big')]:
    e = np.unpackbits(body, bitorder=bo).reshape(16384, 6)
    v = (e * (1 << np.arange(6))).sum(1) if name == "lsb" else (e * (1 << np.arange(5, -1, -1))).sum(1)
    print(f"6bit {name}: frac<24 {(v < 24).mean():.4f} hist head {np.bincount(v, minlength=64)[:8]}")
