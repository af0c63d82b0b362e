"""Test model table as 3 planes of 2-bit entries (rank-k move per context),
and Lehmer-code packings, across alignments."""
import gzip
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = np.frombuffer(raw[501870:514166], 'u1')

def twobit(arr, bo):
    bits = np.unpackbits(arr, bitorder=bo).reshape(-1, 2)
    return bits[:, 0] * 2 + bits[:, 1] if bo == 'big' else bits[:, 0] + 2 * bits[:, 1]

for off in [8, 4, 0]:  # bytes before model
    body = mid[off:off + 12288]
    if len(body) < 12288:
        continue
    for bo in ['little', 'big']:
        v = twobit(body, bo)  # 49152 2-bit values
        # planes hypothesis: 3 x 16384
        p = v.reshape(3, 16384)
        dis = ((p[0] != p[1]) & (p[0] != p[2]) & (p[1] != p[2])).mean()
        # interleaved per-context triples (already tested) skip
        # Lehmer planes: d0<4 always, d1<3, d2<2
        l1 = (p[1] < 3).mean(); l2 = (p[2] < 2).mean()
        print(f"off{off} {bo}: planes-distinct {dis:.4f}  lehmer d1<3 {l1:.4f} d2<2 {l2:.4f}")
        # per-context consecutive triples with lehmer widths 2,2,2
        t = v[:49152].reshape(16384, 3)
        lt = ((t[:, 1] < 3) & (t[:, 2] < 2)).mean()
        print(f"   consecutive lehmer(2,2,2) {lt:.4f}")
