import gzip, struct
import numpy as np

raw = gzip.open('/root/reference/benchmarks/connectomics.npy.ckl.gz').read()
L = raw[2077:501870]
bg, nuq = struct.unpack('<QQ', L[:16])
uniq = np.frombuffer(L[16:16+4*2523], '<u4')
cz = np.frombuffer(L[16+4*2523:16+4*2523+4*512], '<u4').astype(np.int64)
keys = L[16+4*2523+4*512:]
print("bg", bg, "nuq", nuq, "keys bytes", len(keys))
print("first key bytes:", keys[:33].hex())
lead = keys[0]
print("lead byte", lead)
u16 = np.frombuffer(keys[1:], '<u2')
print("u16 count", len(u16))
v = u16.astype(np.int64)
print("min/max/mean", v.min(), v.max(), v.mean())
print("frac<16", (v < 16).mean(), "frac<64", (v < 64).mean(), "frac>=512", (v >= 512).mean())
print("frac < 2523:", (v < 2523).mean())
print("frac < 1225:", (v < 1225).mean())
# distribution of high values
hi = v[v >= 2523]
print("n >= 2523:", len(hi), "their min/max", hi.min() if len(hi) else None, hi.max() if len(hi) else None)
# value histogram coarse
hist, edges = np.histogram(v, bins=[0,1,2,4,8,16,32,64,128,256,512,1024,2048,4096,8192,16384,32768,65536])
for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
    print(f"[{e0},{e1}): {h}")
print("first 64 u16:", list(v[:64]))
# could the u16 stream begin with per-slice counts? check if prefix matches cz
print("cz[:8]:", list(cz[:8]))
# check: are there 512 'large' sentinel values that could frame slices?
# try: cumulative framing where each slice has cz[z] keys? total 576391 > 243818. no.
# check pairs
pairs = v[:len(v)//2*2].reshape(-1, 2)
print("pair col0 mean/max", pairs[:,0].mean(), pairs[:,0].max())
print("pair col1 mean/max", pairs[:,1].mean(), pairs[:,1].max())
print("col0 frac>=512", (pairs[:,0]>=512).mean(), "col1 frac>=512", (pairs[:,1]>=512).mean())
# autocorrelation of high-bit
hb = (v >= 512).astype(float)
for lag in [1,2,3,4,8]:
    c = np.corrcoef(hb[:-lag], hb[lag:])[0,1]
    print("hb autocorr lag", lag, round(float(c),4))
