from .sharded import (
    AXIS,
    make_mesh,
    preamble_step,
    shard_volume,
    sharded_ccl_rounds,
    sharded_distance_rounds,
    sharded_edtsq,
)
from .skeletonize import skeletonize_sharded

__all__ = [
    "AXIS",
    "make_mesh",
    "preamble_step",
    "shard_volume",
    "sharded_ccl_rounds",
    "sharded_distance_rounds",
    "sharded_edtsq",
    "skeletonize_sharded",
]
