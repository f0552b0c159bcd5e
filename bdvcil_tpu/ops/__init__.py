from .tsm_shift import temporal_shift
from .augment import (
    normalize_batch,
    background_blend,
    tubemix,
    rand_bbox,
    temporal_median,
)

__all__ = [
    "temporal_shift",
    "normalize_batch",
    "background_blend",
    "tubemix",
    "rand_bbox",
    "temporal_median",
]
