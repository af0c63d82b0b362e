"""CLI smoke tests (reference kimimaro_cli behavioral surface)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from click.testing import CliRunner

from kimimaro_tpu.cli import main
from kimimaro_tpu.skeleton import Skeleton


@pytest.fixture
def runner():
    return CliRunner()


def test_forge(tmp_path, runner):
    labels = np.zeros((48, 48, 8), dtype=np.uint32)
    labels[8:40, 20:28, 2:6] = 9
    src = tmp_path / "labels.npy"
    np.save(src, labels)

    outdir = tmp_path / "out"
    result = runner.invoke(main, [
        "forge", str(src), "--scale", "2", "--const", "40",
        "--dust", "10", "--no-fill-holes", "-o", str(outdir), "--progress",
    ])
    assert result.exit_code == 0, result.output
    files = os.listdir(outdir)
    assert "9.swc" in files

    skel = Skeleton.from_swc(open(outdir / "9.swc").read())
    assert skel.vertices.shape[0] > 5


def test_swc_roundtrip(tmp_path):
    skel = Skeleton(
        [(0, 0, 0), (1, 1, 0), (2, 2, 0), (2, 3, 0)],
        edges=[(0, 1), (1, 2), (1, 3)],
        radii=[1, 2, 3, 4],
    )
    swc = skel.to_swc()
    back = Skeleton.from_swc(swc)
    assert Skeleton.equivalent(skel, back)
    assert np.allclose(sorted(back.radii), sorted(skel.radii))


def test_swc_from_to(tmp_path, runner):
    img = np.zeros((20, 3, 3), dtype=bool)
    img[:, 1, 1] = True
    src = tmp_path / "skel_img.npy"
    np.save(src, img)

    result = runner.invoke(main, ["swc", "from", str(src)])
    assert result.exit_code == 0, result.output
    swc_path = tmp_path / "skel_img.swc"
    assert swc_path.exists()

    result = runner.invoke(main, ["swc", "to", str(swc_path)])
    assert result.exit_code == 0, result.output
    img2 = np.load(tmp_path / "skel_img.npy")
    assert img2.any()


def test_license(runner):
    result = runner.invoke(main, ["license"])
    assert result.exit_code == 0
    assert "MIT" in result.output or "Permission" in result.output
