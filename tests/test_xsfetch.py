"""The Pallas windowed-fetch kernel (ops.xsfetch, interpret mode on CPU)
must return exactly the same window foreground bits as direct indexing,
and the DMA-fetch cross-section path must agree with the gather path
end to end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kimimaro_tpu.ops import xsbatch, xsfetch
from kimimaro_tpu.ops.xsslab import K


@pytest.fixture(autouse=True)
def _interpret():
    old = xsfetch.INTERPRET
    xsfetch.INTERPRET = True
    yield
    xsfetch.INTERPRET = old


def _volume(shape=(32, 160, 256), n_labels=6, seed=0):
    """(tx, tz, ty) kernel-layout volume of random blobs."""
    rng = np.random.RandomState(seed)
    vol = np.zeros(shape, dtype=np.int32)
    for lab in range(1, n_labels + 1):
        c = rng.randint(0, np.maximum(np.array(shape) - 12, 1))
        e = rng.randint(4, 12, size=3)
        vol[c[0]:c[0] + e[0], c[1]:c[1] + e[1], c[2]:c[2] + e[2]] = lab
    return vol


def test_fetch_secb_matches_direct_indexing():
    tx, tz, ty = 32, 160, 256
    vol = _volume((tx, tz, ty))
    Wx, Wyf = 32, 256
    assert xsfetch.usable((tx, tz, ty), Wx, Wyf)

    rng = np.random.RandomState(1)
    B = 12
    wx0 = np.zeros(B, np.int32)  # tx == Wx
    wy0 = np.zeros(B, np.int32)  # ty == Wyf
    labels = rng.randint(1, 7, size=B).astype(np.int32)
    # sloped slab bases, |dz/dx|,|dz/dy| <= 1, some cells out of range
    zb = np.zeros((B, Wx, Wyf), np.int32)
    for b in range(B):
        sx = rng.uniform(-1, 1)
        sy = rng.uniform(-1, 1)
        z0 = rng.randint(-4, tz + 4)
        ii, jj = np.meshgrid(np.arange(Wx), np.arange(Wyf), indexing="ij")
        zb[b] = np.floor(z0 + sx * ii + sy * jj).astype(np.int32) - K // 2

    out = np.asarray(xsfetch.fetch_secb(
        jnp.asarray(vol), jnp.asarray(zb), jnp.asarray(wx0),
        jnp.asarray(wy0), jnp.asarray(labels), (tx, tz, ty), Wx, Wyf))

    for b in range(B):
        for k in range(K):
            z = zb[b] + k
            valid = (z >= 0) & (z < tz)
            zc = np.clip(z, 0, tz - 1)
            want = np.zeros((Wx, Wyf), bool)
            ii, jj = np.meshgrid(np.arange(Wx), np.arange(Wyf),
                                 indexing="ij")
            want[valid] = (vol[ii[valid], zc[valid], jj[valid]]
                           == labels[b])
            got = ((out[b] >> k) & 1) != 0
            # bits at invalid z are undefined by contract
            np.testing.assert_array_equal(got[valid], want[valid],
                                          err_msg=f"lane {b} bit {k}")


def test_fetch_secb_window_offsets():
    tx, tz, ty = 64, 160, 384
    vol = _volume((tx, tz, ty), seed=3)
    Wx, Wyf = 32, 256
    assert xsfetch.usable((tx, tz, ty), Wx, Wyf)

    rng = np.random.RandomState(2)
    B = 8
    wx0 = rng.randint(0, tx - Wx + 1, size=B).astype(np.int32)
    wy0 = (rng.randint(0, (ty - Wyf) // 128 + 1, size=B) * 128).astype(
        np.int32)
    labels = rng.randint(1, 7, size=B).astype(np.int32)
    zb = rng.randint(-2, tz - 2, size=(B, 1, 1)) + np.zeros(
        (B, Wx, Wyf), np.int32)

    out = np.asarray(xsfetch.fetch_secb(
        jnp.asarray(vol), jnp.asarray(zb), jnp.asarray(wx0),
        jnp.asarray(wy0), jnp.asarray(labels), (tx, tz, ty), Wx, Wyf))

    for b in range(B):
        for k in range(K):
            z = zb[b] + k
            valid = (z >= 0) & (z < tz)
            zc = np.clip(z, 0, tz - 1)
            ii, jj = np.meshgrid(wx0[b] + np.arange(Wx),
                                 wy0[b] + np.arange(Wyf), indexing="ij")
            want = np.zeros((Wx, Wyf), bool)
            want[valid] = (vol[ii[valid], zc[valid], jj[valid]]
                           == labels[b])
            got = ((out[b] >> k) & 1) != 0
            np.testing.assert_array_equal(got[valid], want[valid],
                                          err_msg=f"lane {b} bit {k}")


def test_dma_path_matches_gather_path():
    """End-to-end: cross_section_areas_volume with the DMA path forced
    equals the gather path (areas + contacts) on an eligible volume."""
    # original-layout volume whose z-dominant window perm passes the
    # gates: perm (0,1,2) -> (tx, ty, tz) = (X, Y, Z); kernel layout
    # (X, Z, Y): need Y >= 256, Y % 128 == 0, Z >= 160, Z % 8 == 0
    rng = np.random.RandomState(5)
    X, Y, Z = 32, 256, 160
    vol = np.zeros((X, Y, Z), dtype=np.uint32)
    for lab in range(1, 7):
        c = rng.randint(0, (X - 10, Y - 14, Z - 12))
        e = rng.randint(4, (10, 14, 12))
        vol[c[0]:c[0] + e[0], c[1]:c[1] + e[1], c[2]:c[2] + e[2]] = lab

    qs, vs, ns, ls = [], [], [], []
    for lab in range(1, 7):
        pts = np.argwhere(vol == lab)
        if len(pts) == 0:
            continue
        for p in pts[:: max(1, len(pts) // 4)][:4]:
            vs.append(p)
            # dominant-z normals (tilted), so the DMA path is eligible
            nrm = np.array([rng.uniform(-0.3, 0.3),
                            rng.uniform(-0.3, 0.3), 1.0])
            ns.append(nrm / np.linalg.norm(nrm))
            ls.append(lab)
    vs = np.asarray(vs)
    ns = np.asarray(ns, np.float32)
    ls = np.asarray(ls)

    outs = {}
    for mode in ("0", "1"):
        os.environ["KIMIMARO_TPU_XSB_DMA"] = mode
        try:
            outs[mode] = xsbatch.cross_section_areas_volume(
                vol, vs, ns, ls, anisotropy=(1.0, 1.0, 1.0))
        finally:
            os.environ.pop("KIMIMARO_TPU_XSB_DMA", None)

    a0, c0 = outs["0"]
    a1, c1 = outs["1"]
    np.testing.assert_allclose(a1, a0, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(c1, c0)
