"""Fast training input path: native uint8 decode + device-fused augmentation.

This is the throughput pipeline (SURVEY.md §7.3 "device augmentation kernels"):
the reference decodes, resizes, augments, normalizes and tensorizes every
sample in CPU dataloader workers (§3.3 hot loop); here host threads only run
the C++ decode kernel (native/decoder.cpp: DCT-scaled JPEG decode +
short-side resize + crop into a dense uint8 batch) and everything elementwise
— normalize, flip, background alpha-blend, (optionally) RandAugment — runs
fused on the TPU (ops/augment.py, ops/rand_augment_dev.py).

Augmentation distribution matches the reference train pipeline:
  * SampleFrames(1x8) jittered per segment (data/sampling.py)
  * MultiScaleCrop semantics via "short-side trick": cropping 224^2 from a
    short-side-s resize covers the same area fraction as cropping
    224*(256/s) from a short-side-256 resize, so sampling
    s in {224, 256, 299, 339} == scales (1, .875, .75, .66); the 13 fixed
    offsets are drawn on the resized geometry like MultiScaleCrop
    (num_fixed_crops=13, reference config :129-135)
  * whole-clip flip, bgmix probability / randAug mutex drawn on host
    (per-sample reproducible RNG), applied branchlessly on device

Batch layout out: {'imgs_u8' (B,T,224,224,3) u8, 'bg_u8' (B,224,224,3) u8,
'apply_bgmix' (B,) bool, 'flip' (B,) bool, 'randaug_ops' (B,n) i32 or absent,
'label' (B,1) i64}.
"""

from __future__ import annotations

import os.path as osp
import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

from .sampling import SampleFrames
from . import native

# MultiScaleCrop scales realized via the short-side trick (see class docstring)
MSC_SCALES = (1.0, 0.875, 0.75, 0.66)


def _fixed_crop_offsets(rw: int, rh: int, crop: int) -> List:
    w_step = (rw - crop) // 4
    h_step = (rh - crop) // 4
    offsets = [
        (0, 0),
        (4 * w_step, 0),
        (0, 4 * h_step),
        (4 * w_step, 4 * h_step),
        (2 * w_step, 2 * h_step),
        (0, 2 * h_step),
        (4 * w_step, 2 * h_step),
        (2 * w_step, 4 * h_step),
        (2 * w_step, 0),
        (1 * w_step, 1 * h_step),
        (3 * w_step, 1 * h_step),
        (1 * w_step, 3 * h_step),
        (3 * w_step, 3 * h_step),
    ]
    return offsets


def make_fast_input_fn(
    alpha: float = 0.5,
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
    randaug_n: int = 2,
    randaug_m: int = 10,
    with_randaug: bool = True,
    dtype=None,
):
    """Device half of the fast path, for ``make_train_step(input_fn=...)``:
    uint8 batch dict -> augmented normalized clips, fully fused under jit.

    Order matches the reference train pipeline: RandAugment runs on decoded
    uint8 crops (before Normalize, rand_augment config position :127), then
    normalize + flip + bgmix (mutually exclusive with randAug via the masks
    the loader drew)."""
    import jax.numpy as jnp

    from ..ops.augment import fused_train_augment
    from ..ops.rand_augment_dev import rand_augment_batch

    def input_fn(batch):
        imgs_u8 = batch["imgs_u8"]
        if with_randaug:
            augmented = rand_augment_batch(
                batch["randaug_key"], imgs_u8, n=randaug_n, m=randaug_m
            )
            sel = batch["apply_randaug"][:, None, None, None, None]
            imgs_u8 = jnp.where(sel, augmented, imgs_u8)
        out_dtype = dtype if dtype is not None else jnp.float32
        return fused_train_augment(
            imgs_u8,
            batch["bg_u8"],
            batch["apply_bgmix"],
            batch["flip"],
            alpha=alpha,
            mean=mean,
            std=std,
            dtype=out_dtype,
        )

    return input_fn


class FastEvalLoader:
    """Deterministic uint8 eval batches via the native decoder.

    Covers the standard validation / feature-extraction pipeline shape
    (SampleFrames test-mode -> decode -> Resize(-1, S) -> CenterCrop(c) ->
    Normalize -> NHWC): host does decode+resize+center-crop to uint8, the
    eval step normalizes on device (make_eval_step handles uint8 inputs).
    Emits {'imgs': (B, T, c, c, 3) u8, 'label': (B, 1)} in dataset order.
    """

    def __init__(
        self,
        video_infos: Sequence[dict],
        batch_size: int,
        num_segments: int = 8,
        crop_size: int = 224,
        short_side: int = 256,
        filename_tmpl: str = "img_{:05}.jpg",
        start_index: int = 1,
        num_threads: int = 0,
        prefetch: int = 2,
        tencrop: bool = False,
    ):
        if not native.available():
            raise RuntimeError("native decoder unavailable; use the standard DataLoader")
        self.video_infos = list(video_infos)
        self.batch_size = batch_size
        self.num_segments = num_segments
        self.crop_size = crop_size
        self.short_side = short_side
        self.filename_tmpl = filename_tmpl
        self.start_index = start_index
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.tencrop = tencrop  # emit (B, T, 5, c, c, 3); flips added on-device
        self.sampler = SampleFrames(
            clip_len=1, frame_interval=1, num_clips=num_segments, test_mode=True
        )

    def set_epoch(self, epoch: int) -> None:
        pass  # deterministic

    def __len__(self) -> int:
        return -(-len(self.video_infos) // self.batch_size)

    def _make_batch(self, indices) -> Dict[str, np.ndarray]:
        t, crop = self.num_segments, self.crop_size
        frame_paths: List[str] = []
        labels = np.empty((len(indices), 1), np.int64)
        for row, idx in enumerate(indices):
            info = self.video_infos[int(idx)]
            labels[row, 0] = info["label"]
            frame_inds = self.sampler.sample(info["total_frames"]) + self.start_index
            for fi in frame_inds:
                frame_paths.append(
                    osp.join(info["frame_dir"], self.filename_tmpl.format(int(fi)))
                )
        if self.tencrop:
            imgs = native.decode_tencrop_batch(
                frame_paths, short_side=self.short_side, crop=crop,
                num_threads=self.num_threads,
            )
            return {"imgs": imgs.reshape(len(indices), t, 5, crop, crop, 3), "label": labels}
        imgs = native.decode_resize_crop_batch(
            frame_paths, short_side=self.short_side, out_h=crop, out_w=crop,
            crops=None, num_threads=self.num_threads,
        )
        return {"imgs": imgs.reshape(len(indices), t, crop, crop, 3), "label": labels}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.video_infos)
        batches = [
            np.arange(n)[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        error: List[BaseException] = []

        def producer():
            try:
                for bidx in batches:
                    q.put(self._make_batch(bidx))
            except BaseException as e:  # re-raised in the consumer
                error.append(e)
            finally:
                q.put(stop)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        th.join()
        if error:
            raise error[0]


class FastBGMixLoader:
    """Batched uint8 producer over a BackgroundMixDataset-shaped corpus."""

    def __init__(
        self,
        video_infos: Sequence[dict],
        bg_files: Sequence[str],
        batch_size: int,
        num_segments: int = 8,
        crop_size: int = 224,
        bg_short_side: int = 256,
        filename_tmpl: str = "img_{:05}.jpg",
        start_index: int = 1,
        randaug_prob: float = 0.75,  # bgmix fires on the complement (mutex)
        bgmix_prob: float = 0.25,  # used when randaug_prob < 0 (bgmix-only mode)
        with_randaug_mutex: bool = True,
        flip_ratio: float = 0.0,  # reference train pipeline has no Flip op
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        if not native.available():
            raise RuntimeError("native decoder unavailable; use the standard DataLoader")
        self.video_infos = list(video_infos)
        self.bg_files = list(bg_files)
        self.batch_size = batch_size
        self.num_segments = num_segments
        self.crop_size = crop_size
        self.bg_short_side = bg_short_side
        self.filename_tmpl = filename_tmpl
        self.start_index = start_index
        self.randaug_prob = randaug_prob
        self.bgmix_prob = bgmix_prob
        self.with_randaug_mutex = with_randaug_mutex
        self.flip_ratio = flip_ratio
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.sampler = SampleFrames(clip_len=1, frame_interval=1, num_clips=num_segments)
        # crop 224 at short side 224/scale covers the same area fraction as
        # MultiScaleCrop's crop of base*scale at short side 256
        self.msc_short_sides = tuple(
            int(round(crop_size / s)) for s in MSC_SCALES
        )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.video_infos)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # -- batch assembly ----------------------------------------------------
    def _make_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        b = len(indices)
        t = self.num_segments
        crop = self.crop_size

        frame_paths: List[str] = []
        crops: List = []
        short_sides = np.empty(b * t, np.int32)
        labels = np.empty((b, 1), np.int64)
        flip = np.empty(b, bool)
        apply_bgmix = np.empty(b, bool)
        bg_paths: List[str] = []
        bg_crops: List = []

        apply_randaug = np.zeros(b, bool)
        randaug_keys = np.empty((b, 2), np.uint32)

        for row, idx in enumerate(indices):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, int(idx), 7])
            )
            info = self.video_infos[int(idx)]
            labels[row, 0] = info["label"]
            flip[row] = rng.random() < self.flip_ratio
            randaug_keys[row] = rng.integers(0, 2**32, size=2, dtype=np.uint32)

            # bgmix decision (mutex with randAug; comix_loader.py:110-123):
            # randaug_prob < 0 -> randAug never fires -> bgmix always;
            # randaug_prob >= 1 -> randAug always -> bgmix never
            if self.with_randaug_mutex:
                randaug_fires = self.randaug_prob >= 0 and rng.random() < self.randaug_prob
                apply_randaug[row] = randaug_fires
                apply_bgmix[row] = not randaug_fires
            else:
                apply_randaug[row] = self.randaug_prob >= 0 and rng.random() < self.randaug_prob
                apply_bgmix[row] = rng.random() < self.bgmix_prob

            # whole-clip-consistent crop geometry (MultiScaleCrop semantics)
            short = int(self.msc_short_sides[rng.integers(len(self.msc_short_sides))])
            # resized dims (frames in one video share dims; use first frame's
            # aspect only implicitly via centered candidate offsets: the
            # native kernel clips offsets to the resized extent)
            frame_inds = self.sampler.sample(info["total_frames"], rng) + self.start_index
            # offsets drawn on a square worst case; clipping in the native
            # kernel keeps them valid for any aspect ratio
            offsets = _fixed_crop_offsets(short * 2, short, crop)
            ox, oy = offsets[int(rng.integers(len(offsets)))]

            for fi in frame_inds:
                frame_paths.append(osp.join(info["frame_dir"], self.filename_tmpl.format(int(fi))))
                crops.append((int(ox), int(oy)))
                short_sides[row * t : (row + 1) * t] = short

            if self.bg_files and apply_bgmix[row]:
                bg_paths.append(self.bg_files[int(rng.integers(len(self.bg_files)))])
            else:
                # placeholder (not blended); reuse the first frame path
                bg_paths.append(frame_paths[-1])
                apply_bgmix[row] = apply_bgmix[row] and bool(self.bg_files)
            bx = int(rng.integers(0, 10_000))
            by = int(rng.integers(0, 10_000))
            bg_crops.append((bx, by))  # clipped to valid range natively

        # decode clips grouped by short side (the native call takes one
        # short_side per batch); group rows to keep the call count small
        imgs = np.empty((b * t, crop, crop, 3), np.uint8)
        order = np.argsort(short_sides, kind="stable")
        pos = 0
        while pos < len(order):
            s = short_sides[order[pos]]
            end = pos
            while end < len(order) and short_sides[order[end]] == s:
                end += 1
            sel = order[pos:end]
            out = native.decode_resize_crop_batch(
                [frame_paths[i] for i in sel],
                short_side=int(s),
                out_h=crop,
                out_w=crop,
                crops=[crops[i] for i in sel],
                num_threads=self.num_threads,
            )
            imgs[sel] = out
            pos = end

        bg = native.decode_resize_crop_batch(
            bg_paths,
            short_side=self.bg_short_side,
            out_h=crop,
            out_w=crop,
            crops=bg_crops,
            num_threads=self.num_threads,
        )

        return {
            "imgs_u8": imgs.reshape(b, t, crop, crop, 3),
            "bg_u8": bg,
            "apply_bgmix": apply_bgmix,
            "apply_randaug": apply_randaug,
            "randaug_key": randaug_keys,
            "flip": flip,
            "label": labels,
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.video_infos)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
            rng.shuffle(indices)
        batches = [indices[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        # single producer thread keeps one batch decoding while the device
        # trains on the previous one (the C++ kernel releases the GIL)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        error: List[BaseException] = []

        def producer():
            try:
                for bidx in batches:
                    q.put(self._make_batch(bidx))
            except BaseException as e:  # re-raised in the consumer
                error.append(e)
            finally:
                q.put(stop)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        th.join()
        if error:
            raise error[0]
