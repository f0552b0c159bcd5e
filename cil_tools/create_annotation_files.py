#!/usr/bin/env python
"""Standalone per-task + oracle annotation-file generator with label remap
(reference cil_tools/create_annotation_files.py:1-61). Also writes
class_indices_mapping.json."""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdvcil_tpu.config import Config
from bdvcil_tpu.data.annotations import (
    build_label_remap,
    generate_task_annotation_files,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_ann_file", required=True)
    parser.add_argument("--val_ann_file", required=True)
    parser.add_argument("--destination", required=True)
    parser.add_argument(
        "--task_splits_config",
        required=True,
        help="python file defining task_splits = [[...], ...] (any experiment config works)",
    )
    args = parser.parse_args()

    cfg = Config.fromfile(args.task_splits_config)
    task_splits = cfg.task_splits

    destination = pathlib.Path(args.destination)
    out = generate_task_annotation_files(
        args.train_ann_file,
        args.val_ann_file,
        task_splits,
        destination,
        write_oracle=True,
    )
    for split, files in out.items():
        for f in files:
            print("create file at:", f)

    mapping = build_label_remap(task_splits)
    mapping_file = destination / "class_indices_mapping.json"
    mapping_file.write_text(json.dumps({str(k): v for k, v in mapping.items()}))
    print("create indice mapping file at:", mapping_file)


if __name__ == "__main__":
    main()
