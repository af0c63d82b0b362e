import gzip
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = raw[501870:514166]
stream = np.frombuffer(mid[4:], 'u1')
for bo in ['little', 'big']:
    bits = np.unpackbits(stream[:48], bitorder=bo)
    s = ''.join(map(str, bits))
    print(bo, ' '.join(s[i:i+8] for i in range(0, len(s), 8)))
print("last 16 bytes:")
for bo in ['little', 'big']:
    bits = np.unpackbits(stream[-16:], bitorder=bo)
    s = ''.join(map(str, bits))
    print(bo, ' '.join(s[i:i+8] for i in range(0, len(s), 8)))

# full-stream counts for code families
def count_unary_rice(bits, sense, k):
    n = len(bits); pos = 0; cnt = 0
    while pos < n:
        while pos < n and bits[pos] == sense:
            pos += 1
        if pos >= n: break
        pos += 1 + k
        cnt += 1
    return cnt

for bo in ['little', 'big']:
    bits = np.unpackbits(stream, bitorder=bo).astype(int)
    for sense in [0, 1]:
        row = [count_unary_rice(bits, sense, k) for k in range(6)]
        print(f"{bo} sense{sense} rice k=0..5 counts: {row}")
