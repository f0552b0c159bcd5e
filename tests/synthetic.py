"""Synthetic rawframe trees for integration tests (SURVEY.md §4 implication:
tiny generated JPEG dirs + annotation files)."""

from __future__ import annotations

import pathlib

import cv2
import numpy as np


def make_rawframe_tree(
    root: pathlib.Path,
    num_classes: int = 4,
    videos_per_class: int = 2,
    num_frames: int = 10,
    size=(64, 80),  # (H, W)
    seed: int = 0,
    filename_tmpl: str = "img_{:05}.jpg",
):
    """Create rawframes/<class>_<vid>/img_xxxxx.jpg plus train/val ann files.

    Returns (data_root, train_ann, val_ann). Every video's frames are a solid
    color + noise so decode/transform outputs are easy to sanity-check.
    """
    rng = np.random.default_rng(seed)
    root = pathlib.Path(root)
    frames_root = root / "rawframes"
    frames_root.mkdir(parents=True, exist_ok=True)

    train_lines, val_lines = [], []
    h, w = size
    for cls in range(num_classes):
        for vid in range(videos_per_class):
            name = f"video_c{cls}_v{vid}"
            vdir = frames_root / name
            vdir.mkdir(parents=True, exist_ok=True)
            base = rng.integers(0, 200, size=3)
            for t in range(1, num_frames + 1):
                img = np.clip(
                    base[None, None, :] + rng.integers(0, 55, size=(h, w, 3)), 0, 255
                ).astype(np.uint8)
                cv2.imwrite(str(vdir / filename_tmpl.format(t)), img)
            line = f"{name} {num_frames} {cls}"
            if vid == videos_per_class - 1:
                val_lines.append(line)
            else:
                train_lines.append(line)

    train_ann = root / "train_ann.txt"
    val_ann = root / "val_ann.txt"
    train_ann.write_text("\n".join(train_lines) + "\n")
    val_ann.write_text("\n".join(val_lines) + "\n")
    return frames_root, train_ann, val_ann
