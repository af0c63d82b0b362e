"""Scan alignments for a 16384-entry 6-bit model table in the middle section."""
import gzip
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = np.frombuffer(raw[501870:514166], 'u1')  # 12296 bytes total
need_bits = 16384 * 6  # 98304 bits = 12288 bytes

best = []
for boname, bo in [("lsb", 'little'), ("msb", 'big')]:
    allbits = np.unpackbits(mid, bitorder=bo).astype(np.uint8)
    for start_bit in range(0, (len(mid) * 8 - need_bits) + 1):
        seg = allbits[start_bit:start_bit + need_bits].reshape(16384, 6)
        if boname == "lsb":
            v = (seg * (1 << np.arange(6))).sum(1)
            f0 = seg[:, 0] + 2 * seg[:, 1]; f1 = seg[:, 2] + 2 * seg[:, 3]; f2 = seg[:, 4] + 2 * seg[:, 5]
        else:
            v = (seg * (1 << np.arange(5, -1, -1))).sum(1)
            f0 = 2 * seg[:, 0] + seg[:, 1]; f1 = 2 * seg[:, 2] + seg[:, 3]; f2 = 2 * seg[:, 4] + seg[:, 5]
        fr24 = (v < 24).mean()
        dis = ((f0 != f1) & (f0 != f2) & (f1 != f2)).mean()
        if fr24 > 0.9 or dis > 0.9:
            print(f"HIT {boname} start_bit {start_bit}: frac<24 {fr24:.4f} distinct {dis:.4f}")
        best.append((max(fr24, dis), boname, start_bit, fr24, dis))
best.sort(reverse=True)
print("top 5:", best[:5])
