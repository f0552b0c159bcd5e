"""Synthetic rawframe trees for integration tests (SURVEY.md §4 implication:
tiny generated JPEG dirs + annotation files)."""

from __future__ import annotations

import pathlib
from typing import Optional

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


def make_learnable_rawframe_tree(
    root: pathlib.Path,
    num_classes: int = 6,
    train_videos_per_class: int = 6,
    val_videos_per_class: int = 3,
    num_frames: int = 8,
    size=(64, 80),  # (H, W)
    seed: int = 0,
    video_jitter: int = 28,
    noise: int = 40,
    palette_lo: int = 40,
    palette_hi: int = 215,
    val_jitter: Optional[int] = None,
    filename_tmpl: str = "img_{:05}.jpg",
    extra_val_videos_per_class: int = 0,
):
    """Rawframe tree whose CLASS carries the signal (unlike
    ``make_rawframe_tree``, where each video gets an independent random color
    and val accuracy can only measure memorization).

    Each class owns a base color + a coarse spatial pattern; every video adds
    a color jitter and per-frame noise. ``video_jitter``/``noise`` tune the
    difficulty so val accuracy lands in a discriminative band (0.5-0.95) —
    what the protocol-parity and BN-semantics comparisons need.

    Returns (frames_root, train_ann, val_ann).
    """
    rng = np.random.default_rng(seed)
    root = pathlib.Path(root)
    frames_root = root / "rawframes"
    frames_root.mkdir(parents=True, exist_ok=True)
    h, w = size

    # well-separated class colors + a class-keyed horizontal/vertical gradient.
    # 2 levels/channel yields 8 corner colors; >8 classes adds the midpoint
    # level (27 colors). Gated on num_classes so every existing <=8-class tree
    # keeps consuming the rng stream identically (bit-identical trees).
    corners = [palette_lo, palette_hi]
    if num_classes > 8:
        corners = [palette_lo, (palette_lo + palette_hi) // 2, palette_hi]
    palette = rng.permutation(
        np.stack(np.meshgrid(*[corners] * 3), -1).reshape(-1, 3)
    )[:num_classes]
    yy, xx = np.mgrid[0:h, 0:w]
    grads = [yy / h, xx / w, 1 - yy / h, 1 - xx / w]

    train_lines, val_lines = [], []
    for cls in range(num_classes):
        base = palette[cls].astype(np.int64)
        grad = grads[cls % len(grads)][..., None] * 60 - 30
        for vid in range(train_videos_per_class + val_videos_per_class):
            name = f"video_c{cls}_v{vid}"
            vdir = frames_root / name
            vdir.mkdir(parents=True, exist_ok=True)
            # val videos can carry a larger color jitter (val_jitter) than the
            # train split: the resulting irreducible val error pins accuracy
            # in a discriminative band even when training fully converges
            is_val = vid >= train_videos_per_class
            jit_mag = video_jitter if (not is_val or val_jitter is None) else val_jitter
            jit = rng.integers(-jit_mag, jit_mag + 1, size=3)
            for t in range(1, num_frames + 1):
                img = np.clip(
                    base[None, None] + jit[None, None] + grad
                    + rng.integers(-noise, noise + 1, size=(h, w, 3)),
                    0, 255,
                ).astype(np.uint8)
                cv2.imwrite(str(vdir / filename_tmpl.format(t)), img)
            line = f"{name} {num_frames} {cls}"
            (val_lines if vid >= train_videos_per_class else train_lines).append(line)

        # extra val videos drawn from an INDEPENDENT per-class stream, so
        # growing the val set (finer accuracy granularity for the parity
        # tests) leaves every draw above — and therefore the train tree and
        # the base val videos — bit-identical to extra_val_videos_per_class=0
        xrng = np.random.default_rng(np.random.SeedSequence([seed, 1000 + cls]))
        xjit_mag = video_jitter if val_jitter is None else val_jitter
        for j in range(extra_val_videos_per_class):
            name = f"video_c{cls}_xv{j}"
            vdir = frames_root / name
            vdir.mkdir(parents=True, exist_ok=True)
            jit = xrng.integers(-xjit_mag, xjit_mag + 1, size=3)
            for t in range(1, num_frames + 1):
                img = np.clip(
                    base[None, None] + jit[None, None] + grad
                    + xrng.integers(-noise, noise + 1, size=(h, w, 3)),
                    0, 255,
                ).astype(np.uint8)
                cv2.imwrite(str(vdir / filename_tmpl.format(t)), img)
            val_lines.append(f"{name} {num_frames} {cls}")

    train_ann = root / "train_ann.txt"
    val_ann = root / "val_ann.txt"
    train_ann.write_text("\n".join(train_lines) + "\n")
    val_ann.write_text("\n".join(val_lines) + "\n")
    return frames_root, train_ann, val_ann
