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


def test_swc_to_tiff(tmp_path, runner):
    # reference kimimaro_cli/__init__.py:176-195: --format tiff path; in
    # this environment tifffile is absent, so the CLI must degrade with a
    # message rather than crash (and write nothing)
    skel = Skeleton(
        [(0, 0, 0), (1, 1, 1), (2, 2, 2)], edges=[(0, 1), (1, 2)],
        radii=[1, 1, 1],
    )
    src = tmp_path / "x.swc"
    src.write_text(skel.to_swc())

    result = runner.invoke(main, ["swc", "to", str(src), "--format", "tiff"])
    assert result.exit_code == 0, result.output
    try:
        import tifffile  # noqa: F401

        assert (tmp_path / "x.tiff").exists()
    except ImportError:
        assert "tifffile" in result.output
        assert not (tmp_path / "x.tiff").exists()

    result = runner.invoke(main, ["swc", "to", str(src), "--format", "bmp"])
    assert "invalid format" in result.output


def test_codecs_save_errors(tmp_path):
    from kimimaro_tpu.cli import codecs

    arr = np.zeros((4, 4, 4), dtype=np.uint8)
    # npy + npy.gz round trip
    codecs.save(str(tmp_path / "a.npy"), arr)
    assert np.array_equal(codecs.load(str(tmp_path / "a.npy")), arr)
    codecs.save(str(tmp_path / "a.npy.gz"), arr)
    assert np.array_equal(codecs.load(str(tmp_path / "a.npy.gz")), arr)

    # optional codecs absent here -> clear ImportError naming the package
    for name, pkg in [("a.ckl", "crackle"), ("a.nrrd", "pynrrd"),
                      ("a.nii", "nibabel"), ("a.tif", "tifffile")]:
        try:
            codecs.save(str(tmp_path / name), arr)
        except ImportError as e:
            assert pkg in str(e)
        else:
            pass  # codec available in this env: fine

    with pytest.raises(ValueError):
        codecs.save(str(tmp_path / "a.weird"), arr)


def test_view_degrades_without_microviewer(tmp_path, runner):
    # view must route any volume ext through the codecs loader and degrade
    # with a message (microviewer and crackle absent here)
    vol = tmp_path / "v.npy"
    np.save(vol, np.zeros((3, 3, 3), np.uint8))
    result = runner.invoke(main, ["view", str(vol)])
    assert result.exit_code == 0
    try:
        import microviewer  # noqa: F401
    except ImportError:
        assert "microviewer" in result.output
