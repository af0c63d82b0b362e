"""Round-3 micro-benchmarks for the global trace engine design.

axon pitfall: block_until_ready does NOT actually block on this backend,
and identical dispatches dedup. So every measurement chains N iterations
inside ONE jit via lax.scan (carry-dependent, so iterations can't dedup or
reorder) and forces a scalar fetch at the end; cost = total / N.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

INF = np.float32(np.inf)
S = 512
N_LABELS = 2111
CROP = (128, 128, 64)

key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, n_inner=1):
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.asarray(out).ravel()[0])  # real sync: scalar fetch
    t_compile = time.perf_counter() - t0
    ts = []
    for i in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / n_inner
    print(f"{name}: first={t_compile:.2f}s total={min(ts)*1e3:.1f}ms "
          f"-> {per*1e3:.3f} ms/op  (sink={s:.3g})", flush=True)
    return per


cc = jax.random.randint(key, (S, S, S), 0, N_LABELS, dtype=jnp.int32)
d0 = jax.random.uniform(key, (S, S, S), jnp.float32) * 100


def _sweep_kernel(costs9, H, W):
    def kernel(d_ref, cc_ref, out_ref, prev_ref, pcc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            prev_ref[...] = jnp.full((H + 2, W + 2), INF, jnp.float32)
            pcc_ref[...] = jnp.full((H + 2, W + 2), -1, jnp.int32)

        cur = d_ref[0]
        ccc = cc_ref[0]
        cand = jnp.full_like(cur, INF)
        for (dy, dz), c in costs9:
            sv = prev_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
            sc = pcc_ref[1 + dy:1 + dy + H, 1 + dz:1 + dz + W]
            cand = jnp.minimum(cand, jnp.where(sc == ccc, sv, INF) + c)
        new = jnp.where(ccc > 0, jnp.minimum(cur, cand), INF)
        out_ref[0] = new
        prev_ref[1:H + 1, 1:W + 1] = new
        pcc_ref[1:H + 1, 1:W + 1] = ccc

    return kernel


def sweep_once(d, cc):
    n, H, W = d.shape
    costs9 = []
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            costs9.append(((dy, dz), np.float32(np.sqrt(1 + dy * dy + dz * dz))))
    return pl.pallas_call(
        _sweep_kernel(costs9, H, W),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H + 2, W + 2), jnp.float32),
            pltpu.VMEM((H + 2, W + 2), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(d, cc)


REP = 24


@jax.jit
def sweeps_rep(d, cc):
    def body(dd, _):
        return sweep_once(dd, cc), None

    out, _ = jax.lax.scan(body, d, None, length=REP)
    return out


timeit("sweep 512^3 (euclid, cc-masked)", sweeps_rep, d0, cc, n_inner=REP)


@jax.jit
def rounds_rep(d, cc, cc_y, cc_z):
    def one_round(d):
        d = sweep_once(d, cc)
        d = sweep_once(d[::-1], cc[::-1])[::-1]
        dy = jnp.transpose(d, (1, 0, 2))
        dy = sweep_once(dy, cc_y)
        dy = sweep_once(dy[::-1], cc_y[::-1])[::-1]
        dz = jnp.transpose(dy, (2, 1, 0))
        dz = sweep_once(dz, cc_z)
        dz = sweep_once(dz[::-1], cc_z[::-1])[::-1]
        return jnp.transpose(dz, (1, 2, 0))

    def body(dd, _):
        return one_round(dd), None

    out, _ = jax.lax.scan(body, d, None, length=6)
    return out


cc_y = jnp.transpose(cc, (1, 0, 2))
cc_z = jnp.transpose(cc_y, (2, 1, 0))
timeit("round 512^3 (6 sweeps + 3 transposes)", rounds_rep, d0, cc, cc_y,
       cc_z, n_inner=6)


# ---- crop argmax (lane-chunked)
offs = jax.random.randint(key, (N_LABELS, 3), 0, S - 128, dtype=jnp.int32)
offs = jnp.minimum(offs, jnp.asarray([S, S, S]) - jnp.asarray(CROP))
lids = jnp.arange(1, N_LABELS + 1, dtype=jnp.int32)


@jax.jit
def crop_argmax_rep(packed, cc16, offs, lids):
    def one_pass(packed):
        def one(off, lid):
            c = jax.lax.dynamic_slice(packed, (off[0], off[1], off[2]), CROP)
            l = jax.lax.dynamic_slice(cc16, (off[0], off[1], off[2]), CROP)
            v = jnp.where(l == lid, c, -jnp.inf)
            idx = jnp.argmax(v.ravel())
            return idx, v.ravel()[idx]

        CH = 128
        n = offs.shape[0]
        pad = (-n) % CH
        offs_p = jnp.pad(offs, ((0, pad), (0, 0)))
        lids_p = jnp.pad(lids, (0, pad)).astype(jnp.uint16)

        def body(_, x):
            o, l = x
            return None, jax.vmap(one)(o, l)

        _, (idx, val) = jax.lax.scan(
            body, None, (offs_p.reshape(-1, CH, 3), lids_p.reshape(-1, CH)))
        return idx.reshape(-1)[:n], val.reshape(-1)[:n]

    def body(p, _):
        idx, val = one_pass(p)
        # data dependence so passes can't collapse
        return p + val.astype(jnp.bfloat16).mean() * 0, (idx[0], val[0])

    p, outs = jax.lax.scan(body, packed, None, length=4)
    return outs[1]


packed = d0.astype(jnp.bfloat16)
cc16 = cc.astype(jnp.uint16)
timeit("crop_argmax 2111x(128,128,64)", crop_argmax_rep, packed, cc16, offs,
       lids, n_inner=4)


# ---- point scatter
pts = jax.random.randint(key, (N_LABELS * 512,), 0, S * S * S, dtype=jnp.int32)
vals = jax.random.uniform(key, (N_LABELS * 512,), jnp.float32)


@jax.jit
def scatter_rep(d, pts, vals):
    def body(dd, i):
        return dd.ravel().at[pts + i].min(-vals, mode="drop").reshape(dd.shape), None

    out, _ = jax.lax.scan(body, d, jnp.arange(8, dtype=jnp.int32))
    return out


timeit("scatter 1.08M point-min into 512^3", scatter_rep, d0, pts, vals,
       n_inner=8)


# ---- chase steps
@jax.jit
def chase_rep(d_pad, cc_pad, starts, lids):
    def step(cur, _):
        def one(c, lid):
            win = jax.lax.dynamic_slice(d_pad, (c[0], c[1], c[2]), (3, 3, 3))
            wcc = jax.lax.dynamic_slice(cc_pad, (c[0], c[1], c[2]), (3, 3, 3))
            flat = jnp.where(wcc.reshape(27) == lid, win.reshape(27), INF)
            flat = flat.at[13].set(INF)
            k = jnp.argmin(flat)
            off = jnp.stack([k // 9 - 1, (k // 3) % 3 - 1, k % 3 - 1])
            return jnp.clip(c + off.astype(jnp.int32), 0, S - 1)

        return jax.vmap(one)(cur, lids), None

    out, _ = jax.lax.scan(step, starts, None, length=256)
    return out.astype(jnp.float32)


d_pad = jnp.pad(d0, 1, constant_values=INF)
cc_pad = jnp.pad(cc, 1, constant_values=-1)
t = timeit("chase 2111 lanes", chase_rep, d_pad, cc_pad, offs + 1, lids,
           n_inner=256)
print(f"  -> {t*1e6:.1f} us/step")


# ---- transpose
@jax.jit
def tp_rep(d):
    def body(dd, _):
        return jnp.transpose(dd, (2, 0, 1)) + 0.0, None

    out, _ = jax.lax.scan(body, d, None, length=12)
    return out


timeit("transpose 512^3 f32", tp_rep, d0, n_inner=12)
