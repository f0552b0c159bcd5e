from .annotations import (
    VideoRecord,
    read_annotation_file,
    write_annotation_file,
    build_label_remap,
    split_annotations_by_task,
    accumulate_task_sizes,
)
from .sampling import SampleFrames
from . import transforms  # noqa: F401  (registers pipeline ops)
from . import rand_augment  # noqa: F401
from . import box  # noqa: F401
from .transforms import Compose
from .datasets import (
    RawframeDataset,
    BackgroundMixDataset,
    ActorCutMixDataset,
    build_dataset,
    bg_extraction_tmf,
)
from .loader import DataLoader, collate
from . import native  # noqa: F401
from .device_pipeline import FastBGMixLoader, make_fast_input_fn

__all__ = [
    "VideoRecord",
    "read_annotation_file",
    "write_annotation_file",
    "build_label_remap",
    "split_annotations_by_task",
    "accumulate_task_sizes",
    "SampleFrames",
    "Compose",
    "RawframeDataset",
    "BackgroundMixDataset",
    "ActorCutMixDataset",
    "build_dataset",
    "bg_extraction_tmf",
    "DataLoader",
    "collate",
    "FastBGMixLoader",
    "make_fast_input_fn",
]
