"""kimimaro_tpu — a TPU-native (JAX/XLA/Pallas) volumetric skeletonization
framework with the capabilities of seung-lab/kimimaro.

Public API mirrors the reference package façade
(/root/reference/kimimaro/__init__.py:18-25).
"""

from .intake import (
    DEFAULT_TEASAR_PARAMS,
    DimensionError,
    connect_points,
    skeletonize,
    synapses_to_targets,
)
from .post import join_close_components, postprocess
from .carray import CompressedLabelVolume
from .skeleton import Skeleton
from .utility import extract_skeleton_from_binary_image, moving_average

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_TEASAR_PARAMS",
    "DimensionError",
    "Skeleton",
    "CompressedLabelVolume",
    "connect_points",
    "cross_sectional_area",
    "cross_sectional_area_single",
    "extract_skeleton_from_binary_image",
    "join_close_components",
    "moving_average",
    "oversegment",
    "postprocess",
    "skeletonize",
    "synapses_to_targets",
]


def cross_sectional_area(*args, **kwargs):
    from .xsection import cross_sectional_area as fn

    return fn(*args, **kwargs)


def cross_sectional_area_single(*args, **kwargs):
    from .xsection import cross_sectional_area_single as fn

    return fn(*args, **kwargs)


def oversegment(*args, **kwargs):
    from .oversegment import oversegment as fn

    return fn(*args, **kwargs)
