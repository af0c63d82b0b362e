"""Try VLC decodings of the middle-section bitstream.

Candidates: unary, Elias gamma, Rice(k) for k=0..5, both bit orders,
both bit senses (0-terminated vs 1-terminated unary).
For each, decode greedily and report: how many values decoded when the
stream is exhausted, and whether stopping at exactly N in {16384, 34212}
consumes ~the whole stream. Also report value stats for the 16384 case.
"""
import gzip, struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = raw[501870:514166]
a = struct.unpack('<I', mid[:4])[0]
stream = np.frombuffer(mid[4:], 'u1')  # 12292 bytes
print("a =", a, "stream bytes", len(stream))

for boname, bo in [("lsb", 'little'), ("msb", 'big')]:
    bits = np.unpackbits(stream, bitorder=bo).astype(int)
    n = len(bits)
    for sense in [0, 1]:  # unary digit bit value
        # unary: run of `sense` bits terminated by opposite
        for k in range(0, 6):  # rice remainder bits; k=0 -> pure unary
            pos = 0
            cnt = 0
            vals = []
            ok = True
            while pos < n and cnt < 40000:
                # read unary quotient
                q = 0
                while pos < n and bits[pos] == sense:
                    q += 1
                    pos += 1
                if pos >= n:
                    break
                pos += 1  # terminator
                if pos + k > n:
                    break
                r = 0
                for i in range(k):
                    r = (r << 1) | bits[pos + i]
                pos += k
                vals.append((q << k) | r)
                cnt += 1
                if cnt in (16384, 34212):
                    rem = n - pos
                    if rem < 16:
                        v = np.array(vals)
                        print(f"{boname} sense{sense} rice{k}: count {cnt} rem_bits {rem} "
                              f"max {v.max()} mean {v.mean():.2f} frac0 {(v==0).mean():.3f}")
            # full-stream count
            if cnt < 40000 and cnt not in (16384, 34212):
                pass
        # gamma: N = number of leading `sense` bits, then N+1 bits value
        pos = 0
        cnt = 0
        vals = []
        while pos < n:
            q = 0
            while pos < n and bits[pos] == sense:
                q += 1
                pos += 1
            if pos >= n or q > 25:
                break
            pos += 1
            v = 1
            for i in range(q):
                if pos >= n:
                    break
                v = (v << 1) | bits[pos]
                pos += 1
            vals.append(v)
            cnt += 1
            if cnt in (16384, 34212):
                rem = n - pos
                if rem < 16:
                    vv = np.array(vals)
                    print(f"{boname} sense{sense} gamma: count {cnt} rem_bits {rem} max {vv.max()}")
        print(f"{boname} sense{sense}: gamma full-stream count {cnt}")
