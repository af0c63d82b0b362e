"""Stage-2 dynamic search: header = 18-bit start node, VLC begins at a
candidate bit offset; context seeded at 0. Adds VLC sense flips and raw
first-move variants. Scoring as stage 1 (clean steps before off-grid or
edge repeat; controls = inverse pairs stop scoring)."""
import gzip
import struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
sx = sy = sz = 512
NX = sx + 1
zidx = np.frombuffer(raw[29:29 + 4 * sz], '<u4')
crack_start = len(raw) - int(zidx.sum())
mid = raw[501870:514166]
slice0 = np.frombuffer(raw[crack_start:crack_start + int(zidx[0])], 'u1')
print('slice0 bytes', len(slice0), 'first 8:', slice0[:8].tobytes().hex())
hdr = struct.unpack('<I', slice0[:4].tobytes())[0]
print('hdr u32', hdr, 'low18', hdr & 0x3FFFF, 'top14', bin(hdr >> 18))

ORDER = 7
NCTX = 4 ** ORDER
MASK = NCTX - 1


def perm_tables():
    out = {}
    for skip, tag in [(4, 's4'), (0, 's0'), (8, 's8')]:
        body = np.frombuffer(mid[skip:skip + 12288], 'u1')
        if len(body) < 12288:
            continue
        for bo in ['little', 'big']:
            bits = np.unpackbits(body, bitorder=bo).reshape(16384, 6)
            for fo, ftag in [(0, 'f01'), (1, 'f10')]:
                if fo == 0:
                    d0 = bits[:, 0] * 2 + bits[:, 1]
                    d1 = bits[:, 2] * 2 + bits[:, 3]
                    d2 = bits[:, 4] * 2 + bits[:, 5]
                else:
                    d0 = bits[:, 1] * 2 + bits[:, 0]
                    d1 = bits[:, 3] * 2 + bits[:, 2]
                    d2 = bits[:, 5] * 2 + bits[:, 4]
                d3 = 6 - (d0.astype(int) + d1 + d2)
                tab = np.stack([d0, d1, d2, np.clip(d3, 0, 3)], 1).astype(np.uint8)
                out[f'tab_{tag}_{bo}_{ftag}'] = tab
    ident = np.tile(np.arange(4, dtype=np.uint8), (16384, 1))
    out['identity'] = ident
    return out


MODELS = perm_tables()

DIRSETS = {}
for ax03 in ['y', 'x']:
    for s0 in [1, -1]:
        for s1 in [1, -1]:
            if ax03 == 'y':
                vec = {0: (0, s0), 3: (0, -s0), 1: (s1, 0), 2: (-s1, 0)}
            else:
                vec = {0: (s0, 0), 3: (-s0, 0), 1: (0, s1), 2: (0, -s1)}
            DIRSETS[f'{ax03}{s0}{s1}'] = vec


def score(model, dirs, bo, ctx_mode, start_bit, vlc_sense, max_steps=4000):
    bits = np.unpackbits(slice0, bitorder=bo)
    n = len(bits)
    node = hdr & 0x3FFFF
    x, y = node % NX, node // NX
    edges = set()
    ctx = 0
    prev = -1
    steps = 0
    pos = start_bit
    while pos < n and steps < max_steps:
        b0 = bits[pos] ^ vlc_sense
        if b0 == 0:
            rank = 0
            pos += 1
        elif pos + 1 < n and bits[pos + 1] ^ vlc_sense == 0:
            rank = 1
            pos += 2
        elif pos + 2 < n and bits[pos + 2] ^ vlc_sense == 0:
            rank = 2
            pos += 3
        elif pos + 2 < n:
            rank = 3
            pos += 3
        else:
            break
        d = int(model[ctx][rank])
        if ctx_mode == 'shift_in_low':
            ctx = ((ctx << 2) | d) & MASK
        else:
            ctx = (ctx >> 2) | (d << (2 * (ORDER - 1)))
        if prev >= 0 and d == (prev ^ 3):
            return steps, 'ctrl'
        dx, dy = dirs[d]
        nx_, ny_ = x + dx, y + dy
        if not (0 <= nx_ < NX and 0 <= ny_ < NX):
            return steps, 'grid'
        a = y * NX + x
        b = ny_ * NX + nx_
        e = (a, b) if a < b else (b, a)
        if e in edges:
            return steps, 'edge'
        edges.add(e)
        x, y = nx_, ny_
        steps += 1
        prev = d
    return steps, 'max'


def main():
    results = []
    for mname, model in MODELS.items():
        for dname, dirs in DIRSETS.items():
            for bo in ['little', 'big']:
                for ctx_mode in ['shift_in_low', 'shift_in_high']:
                    for start_bit in [18, 32]:
                        for sense in [0, 1]:
                            s, why = score(model, dirs, bo, ctx_mode,
                                           start_bit, sense)
                            results.append(
                                (s, why, mname, dname, bo, ctx_mode,
                                 start_bit, sense))
    results.sort(key=lambda r: -r[0])
    for r in results[:20]:
        print(r)
    print('total', len(results))
    hist = {}
    for r in results:
        hist[r[0]] = hist.get(r[0], 0) + 1
    print('step histogram:', dict(sorted(hist.items())))


if __name__ == '__main__':
    main()
