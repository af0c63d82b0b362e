"""SWC vertex-position parity harness (BASELINE.md north star: >= 99%).

Compares the full kimimaro_tpu.skeletonize pipeline against an independent
scipy-based TEASAR oracle (tests/oracle_teasar.py — exact EDT + heap
Dijkstra, no shared code with the framework's sweep kernels). The reference
itself cannot run in this image (compiled deps absent, no network), so this
is the strongest available stand-in for reference-generated SWC fixtures;
the oracle mirrors reference trace.py:36-267 step by step.
"""

import numpy as np
import pytest

import kimimaro_tpu
from oracle_teasar import oracle_teasar, vertex_parity

PARAMS = {
    "scale": 1.5,
    "const": 3.0,
    "pdrf_scale": 100000,
    "pdrf_exponent": 4,
}


def _run_pipeline(binimg, anisotropy=(1, 1, 1)):
    skels = kimimaro_tpu.skeletonize(
        binimg.astype(np.uint8),
        teasar_params=PARAMS,
        anisotropy=anisotropy,
        dust_threshold=0,
        fix_borders=False,
        progress=False,
    )
    skel = skels[1]
    return (skel.vertices / np.asarray(anisotropy, np.float32)).round()


def _volumes():
    out = {}

    v = np.zeros((40, 6, 6), dtype=bool)  # straight bar
    v[2:38, 1:5, 1:5] = True
    out["bar"] = v

    v = np.zeros((32, 32, 5), dtype=bool)  # L-shaped tube
    v[2:30, 2:6, 1:4] = True
    v[26:30, 2:30, 1:4] = True
    out["L"] = v

    v = np.zeros((32, 32, 5), dtype=bool)  # Y fork
    v[2:18, 14:18, 1:4] = True
    for i in range(12):
        v[17 + i, 14 - i: 18 - i, 1:4] = True
        v[17 + i, 14 + i: 18 + i, 1:4] = True
    out["Y"] = v

    rng = np.random.RandomState(7)  # winding tube
    v = np.zeros((48, 16, 8), dtype=bool)
    y = 6
    for x in range(2, 46):
        y = int(np.clip(y + rng.randint(-1, 2), 2, 12))
        v[x, y: y + 3, 2:6] = True
    out["winding"] = v

    v = np.zeros((24, 24, 24), dtype=bool)  # diagonal beam
    for i in range(20):
        v[i + 1: i + 4, i + 1: i + 4, i + 1: i + 4] = True
    out["diagonal"] = v

    return out


@pytest.mark.parametrize("name", list(_volumes().keys()))
def test_vertex_parity_against_oracle(name):
    vol = _volumes()[name]
    got = _run_pipeline(vol)
    oracle_v, _ = oracle_teasar(
        vol, anisotropy=(1, 1, 1), black_border=False,
        scale=PARAMS["scale"], const=PARAMS["const"],
        pdrf_scale=PARAMS["pdrf_scale"],
        pdrf_exponent=PARAMS["pdrf_exponent"],
    )
    parity = vertex_parity(got, oracle_v, tol_voxels=1.0)
    print(f"[parity] {name}: {parity * 100:.2f}% "
          f"({len(got)} vs {len(oracle_v)} oracle vertices)")
    assert parity >= 0.99, (
        f"{name}: vertex parity {parity * 100:.2f}% < 99%"
    )


def test_vertex_parity_anisotropic():
    vol = _volumes()["winding"]
    anis = (16.0, 16.0, 40.0)
    got = _run_pipeline(vol, anisotropy=anis)
    oracle_v, _ = oracle_teasar(
        vol, anisotropy=anis, black_border=False,
        scale=PARAMS["scale"], const=PARAMS["const"],
        pdrf_scale=PARAMS["pdrf_scale"],
        pdrf_exponent=PARAMS["pdrf_exponent"],
    )
    parity = vertex_parity(got, oracle_v, tol_voxels=1.5)
    print(f"[parity] winding anisotropic: {parity * 100:.2f}%")
    assert parity >= 0.99
