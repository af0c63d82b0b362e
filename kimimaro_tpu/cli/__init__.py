"""kimimaro_tpu command line interface.

TPU-native rebuild of /root/reference/kimimaro_cli/__init__.py: `forge`
skeletonizes a volume to SWC files (optionally with cross-section
analysis), `swc from/to` converts between binary images and SWC, `view`
visualizes (when microviewer is installed), `license` prints the license.

Run as `python -m kimimaro_tpu.cli ...` or via the `kimimaro-tpu` console
script.
"""

from __future__ import annotations

import os

import click
import numpy as np

import kimimaro_tpu
from kimimaro_tpu.skeleton import Skeleton

from . import codecs


class Tuple3(click.ParamType):
    """Click type for 3 comma-separated integers (reference cli:14-25)."""

    name = "tuple3"

    def convert(self, value, param, ctx):
        if isinstance(value, str):
            try:
                value = tuple(map(int, value.split(",")))
            except ValueError:
                self.fail(
                    f"'{value}' does not contain a comma delimited list of 3 integers."
                )
            if len(value) != 3:
                self.fail(
                    f"'{value}' does not contain a comma delimited list of 3 integers."
                )
        return value


@click.group()
def main():
    """Skeletonize all labels in a segmented volumetric image with a
    TEASAR-based algorithm on TPU/JAX and output SWC.

    Does not accept continuously valued images such as raw microscopy.

    Input formats: npy, npy.gz (ckl/nrrd/nii/tif when codecs installed).
    """


@main.command()
@click.argument("src")
@click.option("--scale", type=float, default=4, show_default=True,
              help="Multiple of boundary distance added to the invalidation zone.")
@click.option("--const", type=float, default=10, show_default=True,
              help="Constant physical distance added to the invalidation zone.")
@click.option("--pdrf-scale", type=int, default=100000, show_default=True,
              help="Constant multiplier of the penalty field.")
@click.option("--pdrf-exponent", type=int, default=4, show_default=True,
              help="Exponent of the penalty field (powers of two are faster).")
@click.option("--soma-detect", type=float, default=750, show_default=True,
              help="DBF threshold that triggers the more expensive soma check.")
@click.option("--soma-accept", type=float, default=1100, show_default=True,
              help="DBF threshold that triggers special soma processing.")
@click.option("--soma-scale", type=float, default=2, show_default=True,
              help="Multiple of boundary distance for the soma invalidation zone.")
@click.option("--soma-const", type=float, default=300, show_default=True,
              help="Constant physical distance for the soma invalidation zone.")
@click.option("--anisotropy", type=Tuple3(), default="1,1,1", show_default=True,
              help="Physical size of a voxel along x,y,z.")
@click.option("--dust", type=int, default=1000, show_default=True,
              help="Skip connected components smaller than this many voxels.")
@click.option("--progress", is_flag=True, default=False, show_default=True)
@click.option("--fill-holes/--no-fill-holes", is_flag=True, default=True,
              show_default=True, help="Fill holes in each connected component.")
@click.option("--fix-avocados", is_flag=True, default=False, show_default=True,
              help="Combine separately-labeled nuclei with their cell bodies.")
@click.option("--fix-borders", is_flag=True, default=False, show_default=True,
              help="Pin skeleton endpoints where shapes touch the border.")
@click.option("--fix-branches", is_flag=True, default=True, show_default=True,
              help="Improve quality of forked shapes.")
@click.option("--max-paths", type=int, default=None, show_default=True,
              help="Maximum number of paths to trace per object.")
@click.option("-p", "--parallel", type=int, default=1, show_default=True,
              help="Accepted for parity; the device parallelizes labels.")
@click.option("-o", "--outdir", type=str, default="kimimaro_out", show_default=True,
              help="Where to write the SWC files.")
@click.option("--cross-section", type=int, default=0, show_default=True,
              help="Cross-section analysis normal smoothing window, 0=off.")
def forge(
    src, scale, const, pdrf_scale, pdrf_exponent,
    soma_detect, soma_accept, soma_scale, soma_const,
    anisotropy, dust, progress, fill_holes,
    fix_avocados, fix_borders, fix_branches,
    max_paths, parallel, outdir, cross_section,
):
    """Skeletonize an input image and write out SWCs."""
    labels = codecs.load(src)

    skels = kimimaro_tpu.skeletonize(
        labels,
        teasar_params={
            "scale": scale,
            "const": const,
            "pdrf_scale": pdrf_scale,
            "pdrf_exponent": pdrf_exponent,
            "soma_detection_threshold": soma_detect,
            "soma_acceptance_threshold": soma_accept,
            "soma_invalidation_scale": soma_scale,
            "soma_invalidation_const": soma_const,
            "max_paths": max_paths,
        },
        anisotropy=anisotropy,
        dust_threshold=dust,
        progress=progress,
        fill_holes=fill_holes,
        fix_avocados=fix_avocados,
        fix_branching=fix_branches,
        fix_borders=fix_borders,
        parallel=parallel,
    )

    os.makedirs(outdir, exist_ok=True)
    for label, skel in skels.items():
        with open(os.path.join(outdir, f"{label}.swc"), "wt") as f:
            f.write(skel.to_swc())

    if progress:
        print(f"kimimaro_tpu: wrote {len(skels)} skeletons to {outdir}")

    if cross_section > 0:
        skels = kimimaro_tpu.cross_sectional_area(
            labels, skels,
            anisotropy=anisotropy,
            progress=progress,
            smoothing_window=cross_section,
            fill_holes=fill_holes,
        )
        for label, skel in skels.items():
            np.save(os.path.join(outdir, f"{label}_xs_area.npy"),
                    skel.cross_sectional_area)
            np.save(os.path.join(outdir, f"{label}_xs_area_contacts.npy"),
                    skel.cross_sectional_area_contacts)
        if progress:
            print(f"Wrote cross sectional areas and contacts to {outdir}")


@main.group()
def swc():
    """Utilities for managing SWC files. Use forge to create skeletons."""


@swc.command("from")
@click.argument("src", nargs=-1)
def from_image(src):
    """Convert an already-thinned binary image into an SWC."""
    for srcpath in src:
        try:
            image = codecs.load(srcpath)
        except ImportError:
            print(f"kimimaro_tpu: {srcpath} format not installed.")
            return
        skel = kimimaro_tpu.extract_skeleton_from_binary_image(image)
        basename, _ = os.path.splitext(srcpath)
        with open(f"{basename}.swc", "wt") as f:
            f.write(skel.to_swc())


@swc.command("to")
@click.argument("src", nargs=-1)
@click.option("--format", "fmt", type=str, default="npy", show_default=True,
              help="Output format: npy or tiff.")
def to_image(src, fmt):
    """Convert an SWC into a binary image."""
    if fmt not in ("npy", "tiff"):
        print(f"kimimaro_tpu: invalid format {fmt}. npy or tiff allowed.")
        return

    for srcpath in src:
        with open(srcpath, "rt") as f:
            skel = Skeleton.from_swc(f.read())

        minpt = np.floor(skel.vertices.min(axis=0)).astype(int)
        maxpt = np.ceil(skel.vertices.max(axis=0)).astype(int) + 1
        image = np.zeros(tuple((maxpt - minpt).tolist()), dtype=bool)
        drawpts = (skel.vertices - minpt).round().astype(int)
        image[drawpts[:, 0], drawpts[:, 1], drawpts[:, 2]] = True

        basename, _ = os.path.splitext(srcpath)
        if fmt == "npy":
            np.save(f"{basename}.npy", image)
        else:
            try:
                import tifffile
            except ImportError:
                print("kimimaro_tpu: tifffile not installed.")
                return
            tifffile.imwrite(
                f"{basename}.tiff",
                image.astype(np.float32, copy=False),
                photometric="minisblack",
                metadata={"axes": "ZYX"},
                imagej=True,
            )


@main.command()
@click.argument("filename")
@click.option("--port", type=int, default=8080, show_default=True)
@click.option("--color-by", type=str, default="r", show_default=True,
              help="r = radius, c = components, x = cross sectional area.")
def view(filename, port, color_by):
    """Visualize a .swc or .npy file (requires microviewer)."""
    try:
        import microviewer
    except ImportError:
        print("kimimaro_tpu: microviewer is not installed in this environment.")
        return

    _, ext = os.path.splitext(filename)
    if ext == ".swc":
        with open(filename, "rt") as f:
            skel = Skeleton.from_swc(f.read())
        microviewer.objects([skel], skeleton_color_by=color_by)
        return
    # volumes route through the extension-sniffing loader: npy/npy.gz/ckl/
    # nrrd/nii/tif (reference kimimaro_cli/__init__.py:197-219 + codecs)
    try:
        labels = codecs.load(filename)
    except ImportError as e:
        print(f"kimimaro_tpu: {e}")
        return
    except ValueError:
        print(f"kimimaro_tpu: {filename} was not a viewable format "
              "(.swc or a volume: .npy/.npy.gz/.ckl/.nrrd/.nii/.tif).")
        return
    microviewer.view(labels, seg=True, port=port)


@main.command()
def license():
    """Print the license for this library and CLI tool."""
    path = os.path.join(os.path.dirname(__file__), "..", "..", "LICENSE")
    path = os.path.abspath(path)
    if os.path.exists(path):
        with open(path, "rt") as f:
            print(f.read())
    else:
        print("MIT (see repository LICENSE)")


if __name__ == "__main__":
    main()
