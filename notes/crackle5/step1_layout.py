"""Round-5 crackle recon step 1: verify layout + markov-model-table hypothesis.

Hypothesis: format_field bits 9-12 = markov_model_order = 7, and the
12,296-byte middle section at [501870:514166) is
  [u32 a][u32 b][16384 x 6-bit permutation-prefix table]  (4+4+12288)
Each 6-bit entry = three 2-bit move codes (top-3 ranks; 4th implied).
If all 16384 entries have 3 DISTINCT 2-bit fields under some bit order,
the hypothesis is confirmed (random chance 0.375^16384 ~ 0).
"""
import gzip, struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
print("total", len(raw))
hdr = raw[:29]
print("magic", hdr[:4], "ver", hdr[4])
ff = struct.unpack('<H', hdr[5:7])[0]
print("format_field", hex(ff), bin(ff))
sx, sy, sz = struct.unpack('<III', hdr[7:19])
print("sx sy sz", sx, sy, sz)
print("grid_size byte[19]", hdr[19])
nlb = struct.unpack('<I', hdr[20:24])[0]
print("num_label_bytes", nlb)
print("bytes[24:29]", hdr[24:29].hex())

# field guesses
print("data_width", 1 << (ff & 0b11))
print("stored_data_width", 1 << ((ff >> 2) & 0b11))
print("crack_format bit4", (ff >> 4) & 1)
print("label_format bits5-6", (ff >> 5) & 0b11)
print("fortran bit7", (ff >> 7) & 1)
print("signed bit8", (ff >> 8) & 1)
print("bits9-12", (ff >> 9) & 0b1111)
print("bits13-15", (ff >> 13) & 0b111)

zidx = np.frombuffer(raw[29:29+4*sz], '<u4')
print("zidx sum", zidx.sum(), "min/max", zidx.min(), zidx.max())
labels_start = 29 + 4*sz
labels_end = labels_start + nlb
print("labels:", labels_start, labels_end)
crack_start = len(raw) - int(zidx.sum())
print("crack_start", crack_start, "middle bytes:", crack_start - labels_end)

mid = raw[labels_end:crack_start]
a, b = struct.unpack('<II', mid[:8])
print("mid u32s:", a, b, "| remaining", len(mid) - 8)

model = np.frombuffer(mid[8:], 'u1')
assert len(model) == 12288, len(model)

# interpret as 16384 6-bit entries; try both bit orders
bits_lsb = np.unpackbits(model, bitorder='little')
bits_msb = np.unpackbits(model, bitorder='big')
for name, bits in [("lsb", bits_lsb), ("msb", bits_msb)]:
    e = bits.reshape(16384, 6)
    for pairing in ["01,23,45", "10,32,54"]:
        if pairing == "01,23,45":
            f0 = e[:, 0] * 2 + e[:, 1]; f1 = e[:, 2] * 2 + e[:, 3]; f2 = e[:, 4] * 2 + e[:, 5]
        else:
            f0 = e[:, 1] * 2 + e[:, 0]; f1 = e[:, 3] * 2 + e[:, 2]; f2 = e[:, 5] * 2 + e[:, 4]
        distinct = (f0 != f1) & (f0 != f2) & (f1 != f2)
        print(f"{name} {pairing}: distinct-frac {distinct.mean():.4f}")
