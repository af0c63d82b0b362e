"""Test (run,perm) pair hypotheses on the middle-section unary stream."""
import gzip
import struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
mid = raw[501870:514166]
a = struct.unpack('<I', mid[:4])[0]
stream = np.frombuffer(mid[4:], 'u1')
print('a =', a, 'bytes', len(stream))

for bo in ['little', 'big']:
    for sense in [0, 1]:
        bits = np.unpackbits(stream, bitorder=bo)
        if sense == 1:
            bits = 1 - bits
        # unary: count of leading 1s terminated by 0 => value = run of 1s?
        # use: value = number of `1` bits before a `0` terminator
        idx = np.flatnonzero(bits == 0)
        vals = np.diff(np.concatenate([[-1], idx])) - 1
        print(f'{bo} sense{sense}: n={len(vals)} sum={vals.sum()} '
              f'max={vals.max()} zeros={np.mean(vals==0):.3f}')
        if len(vals) < 3:
            continue
        for skip in [0, 1]:
            v = vals[skip:]
            if len(v) % 2:
                v = v[:-1]
            ev, od = v[0::2], v[1::2]
            print(f'  skip{skip}: even sum={ev.sum()} max={ev.max()} '
                  f'frac<24={(ev<24).mean():.3f} | odd sum={od.sum()} '
                  f'max={od.max()} frac<24={(od<24).mean():.3f}')
