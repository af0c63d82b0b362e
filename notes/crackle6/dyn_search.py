"""Dynamic grammar search for the crackle v1 crack-code bitstream.

Prior rounds established (notes/crackle_recon.md):
  - streams are rank-VLC coded ({0,10,110,111}-like), markov order 7
  - chain header u32 = 18-bit start node + 7 raw 2-bit first moves
  - middle section [501870:514166) = [u32 a=34212][12292 B] is the best
    markov-model-table candidate (16384 contexts x ~6 bits)
  - direction codes likely satisfy inverse(d) = d ^ 0b11

This script scores candidate grammars DYNAMICALLY: decode the first chain
of slice 0 and count steps until the walk leaves the 513x513 crack grid or
repeats a crack edge. A wrong grammar behaves like a 2D random walk and
repeats an edge within ~dozens of steps; the true grammar stays clean for
the whole chain. Controls (inverse pairs) are treated as "stop scoring"
markers in stage 1.
"""
import gzip
import struct
import itertools
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
sx = sy = sz = 512
NX = sx + 1  # crack grid nodes per row
zidx = np.frombuffer(raw[29:29 + 4 * sz], '<u4')
crack_start = len(raw) - int(zidx.sum())
mid = raw[501870:514166]
slice0 = np.frombuffer(raw[crack_start:crack_start + int(zidx[0])], 'u1')

ORDER = 7
NCTX = 4 ** ORDER
MASK = NCTX - 1

# ---- candidate model tables ------------------------------------------------
# Each model is a (16384, 4) uint8 array: model[ctx][rank] = direction.
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
                d3 = (0 + 1 + 2 + 3) - (d0.astype(int) + d1 + d2)
                tab = np.stack([d0, d1, d2, np.clip(d3, 0, 3)], 1).astype(np.uint8)
                out[f'tab_{tag}_{bo}_{ftag}'] = tab
    # identity model (= no markov benefit but tests the VLC/grammar alone)
    ident = np.tile(np.arange(4, dtype=np.uint8), (16384, 1))
    out['identity'] = ident
    return out

MODELS = perm_tables()

# ---- direction assignments (inverse(d) = d^3) -------------------------------
# pair (0,3) on one axis, (1,2) on the other
DIRSETS = {}
for ax03 in ['y', 'x']:
    for s0 in [1, -1]:
        for s1 in [1, -1]:
            if ax03 == 'y':
                vec = {0: (0, s0), 3: (0, -s0), 1: (s1, 0), 2: (-s1, 0)}
            else:
                vec = {0: (s0, 0), 3: (-s0, 0), 1: (0, s1), 2: (0, -s1)}
            DIRSETS[f'{ax03}{s0}{s1}'] = vec

# ---- bit readers -------------------------------------------------------------
def bits_of(stream, bo):
    return np.unpackbits(stream, bitorder=bo)

# ---- the scorer --------------------------------------------------------------
def score(model, dirs, bo, ctx_mode, hdr_mode, max_steps=4000):
    bits = bits_of(slice0, bo)
    n = len(bits)
    hdr = struct.unpack('<I', slice0[:4].tobytes())[0]
    node = hdr & 0x3FFFF
    x, y = node % NX, node // NX
    if not (0 <= x < NX and 0 <= y <= sy):
        return -1, 'hdr'
    top = hdr >> 18
    first = []
    for i in range(7):
        if hdr_mode == 'lsb':
            first.append((top >> (2 * i)) & 3)
        else:
            first.append((top >> (2 * (6 - i))) & 3)
    edges = set()
    ctx = 0
    prev = -1
    steps = 0

    def apply_move(d):
        nonlocal x, y, steps
        dx, dy = dirs[d]
        nx_, ny_ = x + dx, y + dy
        if not (0 <= nx_ < NX and 0 <= ny_ < NX):
            return 'grid'
        a = y * NX + x
        b = ny_ * NX + nx_
        e = (a, b) if a < b else (b, a)
        if e in edges:
            return 'edge'
        edges.add(e)
        x, y = nx_, ny_
        steps += 1
        return None

    for d in first:
        if ctx_mode == 'shift_in_low':
            ctx = ((ctx << 2) | d) & MASK
        else:
            ctx = (ctx >> 2) | (d << (2 * (ORDER - 1)))
        r = apply_move(d)
        if r:
            return steps, 'hdr7-' + r
        prev = d

    pos = 32  # bit position after the u32 header
    while pos < n and steps < max_steps:
        # rank VLC: 0 -> 0, 10 -> 1, 110 -> 2, 111 -> 3
        if bits[pos] == 0:
            rank = 0
            pos += 1
        elif pos + 1 < n and bits[pos + 1] == 0:
            rank = 1
            pos += 2
        elif pos + 2 < n and bits[pos + 2] == 0:
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
            return steps, 'ctrl'  # control pair: stop scoring stage 1
        r = apply_move(d)
        if r:
            return steps, r
        prev = d
    return steps, 'max'


def main():
    results = []
    for mname, model in MODELS.items():
        for dname, dirs in DIRSETS.items():
            for bo in ['little', 'big']:
                for ctx_mode in ['shift_in_low', 'shift_in_high']:
                    for hdr_mode in ['lsb', 'msb']:
                        s, why = score(model, dirs, bo, ctx_mode, hdr_mode)
                        results.append((s, why, mname, dname, bo, ctx_mode, hdr_mode))
    results.sort(reverse=True)
    for r in results[:25]:
        print(r)
    print(f'total variants: {len(results)}')
    top = [r for r in results if r[0] >= 100]
    print(f'variants reaching >=100 clean steps: {len(top)}')


if __name__ == '__main__':
    main()
