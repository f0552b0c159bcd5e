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
  * the EXACT mmaction2 MultiScaleCrop crop-box distribution — all 10
    (w, h) scale candidates incl. non-square, the <3 snap rule, and the 13
    fixed offsets computed on the true resized geometry (JPEG headers are
    probed once per video) — realized as one per-clip anisotropic resize +
    fixed crop in the native kernel (plan_train_geometry; reference config
    :129-135). Only the interpolation footprint differs (resize-then-crop
    vs crop-then-resize).
  * background RandomCrop offsets uniform over the true valid range
    (plan_bg_crop; comix_loader.py:72-75)
  * whole-clip flip, bgmix probability / randAug mutex drawn on host
    (per-sample reproducible RNG), applied branchlessly on device

Batch layout out: {'imgs_u8' (B,T,224,224,3) u8, 'bg_u8' (B,224,224,3) u8,
'apply_bgmix' (B,) bool, 'flip' (B,) bool, 'randaug_key' (B,2) u32,
'label' (B,1) i64, 'sample_weight' (B,) f32 when pad_to_batch}.
"""

from __future__ import annotations

import os.path as osp
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

from .sampling import SampleFrames
from . import native

# MultiScaleCrop scales realized via the short-side trick (see class docstring)
MSC_SCALES = (1.0, 0.875, 0.75, 0.66)

# producer phase timing, enabled with BDVC_PROFILE_PRODUCER=1 (read by
# tools/profile_e2e.py); accumulates across loader workers under a lock
PRODUCER_STATS: Dict[str, float] = {}
_PRODUCER_STATS_LOCK = threading.Lock()


def _producer_profiling_enabled() -> bool:
    import os

    return os.environ.get("BDVC_PROFILE_PRODUCER", "") not in ("", "0")


def _record_producer_phases(**seconds: float) -> None:
    with _PRODUCER_STATS_LOCK:
        for k, v in seconds.items():
            PRODUCER_STATS[k] = PRODUCER_STATS.get(k, 0.0) + v
        PRODUCER_STATS["batches"] = PRODUCER_STATS.get("batches", 0.0) + 1.0


def resolve_wire_format(wire_format: str, crop_size: int) -> str:
    """Resolve the host->device wire format for the fast input path.

    'rgb' ships decoded uint8 RGB crops (bit-parity with the host cv2/PIL
    pipeline). 'yuv420' ships the JPEG's stored luma/chroma planes — half
    the bytes, ~1/3 less host decode work — and the jitted input_fn
    reconstructs RGB on device (ops/augment.yuv420_to_rgb); reconstruction
    differs from the RGB path by ~1 gray level at resize geometry
    (tests/test_yuv_wire.py). 'planes' ships the STORED-resolution planes and
    moves the windowed bilinear resize itself onto the MXU as exact integer
    matmuls (ops/augment.resize_plane_bilinear_taps) — pixel output is
    bit-identical to 'yuv420' while warm host work per frame drops to a
    plane-cache memcpy (tests/test_planes_wire.py). 'auto' picks yuv420 when
    the native kernel exists (else rgb): on hosts where the host->device
    wire rides a CPU-mediated transport (the tunneled dev box), the planes
    wire's extra bytes (stored res ~1.55x the crop area at UCF geometry)
    cost more than the host resize they avoid — measured medians 82 vs 56
    clips/s e2e (PERF_NOTES "Round 3: planes wire"). On PCIe/DMA-attached
    production hosts set fast_input_wire_format='planes' to cut steady-state
    producer CPU ~3-4x (8-18 vs 28-88 ms/batch measured)."""
    if wire_format == "auto":
        return "yuv420" if native.has_yuv420() and crop_size % 2 == 0 else "rgb"
    if wire_format == "yuv420" and not (native.has_yuv420() and crop_size % 2 == 0):
        raise ValueError(
            f"wire_format='yuv420' needs the yuv420 native kernel and an even "
            f"crop size (got crop={crop_size}, has_yuv420={native.has_yuv420()})"
        )
    if wire_format == "planes" and not (
        native.has_fetch_planes() and native.has_yuv420() and crop_size % 2 == 0
    ):
        raise ValueError(
            f"wire_format='planes' needs the fetch_planes + yuv420 native "
            f"kernels and an even crop size (got crop={crop_size})"
        )
    if wire_format not in ("rgb", "yuv420", "planes"):
        raise ValueError(f"unknown wire_format {wire_format!r}")
    return wire_format


def fast_pipeline_mismatch(pipeline, *, num_segments: int, randaug_prob: float):
    """Why the fast input path cannot reproduce ``pipeline`` exactly, or
    None when it can.

    The fast path implements exactly the canonical reference train chain
    (config_templates._pipelines; reference config :124-163):
    SampleFrames(1x1xT) -> RawFrameDecode -> Resize(-1, S) ->
    RandAugment(n=2, m=10, prob=randAug_prob) -> MultiScaleCrop(13 fixed
    crops, gap 1) -> Resize(square, keep_ratio=False) -> Normalize(RGB) ->
    FormatShape(NHWC)/Collect/ToTensor. A pipeline containing anything else
    (Flip, ColorJitter, different RandAugment hyperparameters, ...) must
    fall back to the host pipeline rather than silently train on a
    different augmentation distribution — the trainer logs the returned
    reason and declines the fast path."""
    supported = {
        "SampleFrames",
        "RawFrameDecode",
        "Resize",
        "RandAugment",
        "MultiScaleCrop",
        "Normalize",
        "FormatShape",
        "Collect",
        "ToTensor",
    }
    # Omitted per-op params must be filled with the HOST op's defaults (the
    # behavior the fast path has to reproduce), never with the fast path's
    # own expectation — op.get('prob', randaug_prob) would wave through a
    # pipeline the host runs at prob=0.5 while the fast path runs it at the
    # config's randAug_prob.
    sig = []  # semantic op sequence, order-checked against the canonical chain
    msc_size = fixed_resize = None
    for op in pipeline:
        t = op.get("type")
        if t not in supported:
            return f"pipeline op {t!r} is not implemented by the fast path"
        if t == "SampleFrames":
            if op.get("clip_len", 1) != 1 or op.get("frame_interval", 1) != 1:
                return "fast path only implements SampleFrames(clip_len=1, frame_interval=1)"
            # host default num_clips=1 (data/sampling.py)
            if int(op.get("num_clips", 1)) != int(num_segments):
                return "SampleFrames num_clips differs from the model's num_segments"
            if op.get("test_mode", False):
                return "test-mode SampleFrames in a train pipeline"
        elif t == "Resize":
            scale = op.get("scale")
            if op.get("keep_ratio", True):
                if not (isinstance(scale, (tuple, list)) and scale[0] == -1):
                    return f"keep-ratio Resize with scale {scale!r} (only (-1, S) supported)"
            else:
                if not (isinstance(scale, (tuple, list)) and scale[0] == scale[1]):
                    return f"fixed Resize with non-square scale {scale!r}"
                fixed_resize = int(scale[0])
        elif t == "RandAugment":
            if int(op.get("n", 2)) != 2 or int(op.get("m", 10)) != 10:
                return "RandAugment n/m differ from the fast path's (2, 10)"
            # host default prob=0.5 (data/rand_augment.py); when the config
            # disables the loader's RandAugment entirely (randaug_prob < 0)
            # the presence check below gives the clearer reason
            if randaug_prob >= 0 and abs(
                float(op.get("prob", 0.5)) - float(randaug_prob)
            ) > 1e-9:
                return "RandAugment prob differs from config randAug_prob"
        elif t == "MultiScaleCrop":
            if op.get("random_crop", False):
                return "MultiScaleCrop(random_crop=True) is not implemented"
            if int(op.get("max_wh_scale_gap", 1)) != 1:
                return "MultiScaleCrop max_wh_scale_gap != 1 is not implemented"
            # host default num_fixed_crops=5 (data/transforms.py)
            if int(op.get("num_fixed_crops", 5)) != 13:
                return "MultiScaleCrop num_fixed_crops != 13 is not implemented"
            size = op.get("input_size")
            if isinstance(size, (tuple, list)):
                # a non-square input_size changes the host crop-box shape —
                # collapsing it to size[0] would wave a (224, 256) MSC
                # through the exactness gate
                if len(size) != 2 or int(size[0]) != int(size[1]):
                    return (f"MultiScaleCrop non-square input_size {tuple(size)!r} "
                            "is not implemented by the fast path")
                size = size[0]
            msc_size = size
        elif t == "Normalize":
            if op.get("to_bgr", False):
                return "Normalize(to_bgr=True) is not implemented"
        elif t == "FormatShape":
            # the fast path emits NHWC; the recognizer accepts NHWC and NCHW
            # identically (models/recognizer.py), so the reference configs'
            # NCHW is fine — only exotic layouts decline
            if op.get("input_format", "NHWC") not in ("NHWC", "NCHW"):
                return f"FormatShape {op.get('input_format')!r} (fast path emits NHWC)"
        if t == "Resize":
            sig.append("Resize(-1,S)" if op.get("keep_ratio", True) else "Resize(square)")
        elif t not in ("Collect", "ToTensor"):  # metadata-only ops
            sig.append(t)
    # exact chain: the fast path implements the canonical sequence as ONE
    # fused recipe, so the ops must all be present and in canonical order —
    # a reordered / partial pipeline (e.g. RandAugment after the crop, or a
    # missing Normalize) computes different pixels on the host
    canonical = ["SampleFrames", "RawFrameDecode", "Resize(-1,S)", "RandAugment",
                 "MultiScaleCrop", "Resize(square)", "Normalize", "FormatShape"]
    if randaug_prob < 0:
        canonical.remove("RandAugment")
        if "RandAugment" in sig:
            return "pipeline has RandAugment but config randAug_prob < 0"
    elif "RandAugment" not in sig:
        # the loader would apply RandAugment (config randAug_prob >= 0) that
        # the configured host pipeline does not contain
        return "config randAug_prob >= 0 but the pipeline has no RandAugment op"
    if sig != canonical:
        return f"pipeline op sequence {sig} != canonical fast-path chain {canonical}"
    # the fast path draws MSC crop boxes sized from the FINAL square size
    # (decode-to-output), which is only equivalent when the host's MSC
    # input_size equals the fixed Resize scale (true of every reference
    # config; a 224-crop-then-256-upscale pipeline is a different crop-box
    # distribution)
    if int(msc_size) != int(fixed_resize):
        return (f"MultiScaleCrop input_size {msc_size} != fixed Resize scale "
                f"{fixed_resize} (fast path decodes straight to the output square)")
    return None


def resized_dims(w: int, h: int, short_side: int) -> tuple:
    """Post-resize dims for a short-side resize, matching mmcv rescale
    semantics (int(dim * factor + 0.5), decoder.cpp resize contract)."""
    factor = short_side / min(w, h)
    return int(w * factor + 0.5), int(h * factor + 0.5)


def plan_train_geometry(
    rng,
    orig_w: int,
    orig_h: int,
    input_size: int = 224,
    short_side: int = 256,
    scales=MSC_SCALES,
    max_wh_scale_gap: int = 1,
    num_fixed_crops: int = 13,
) -> tuple:
    """Whole-clip train-crop plan with the EXACT mmaction2 MultiScaleCrop
    crop-box distribution, realized as one anisotropic resize + fixed crop.

    Reference pipeline (config train_pipeline :126-135): Resize(-1, S) ->
    MultiScaleCrop(input, scales, gap, 13 fixed offsets) -> Resize(input²).
    This draws the (crop_w, crop_h) candidate and the fixed offset with the
    same sampling scheme AND rng-draw order as the host MultiScaleCrop
    transform (data/transforms.py:177-223), on the true resized geometry
    (rw, rh) = resized_dims(W, H, S), then folds the final square resize in:
    resize the original to (rw·input/crop_w, rh·input/crop_h) and crop
    input² at the scaled offset. Offsets are exact up to <=0.5 px rounding;
    the interpolation footprint is resize-then-crop instead of
    crop-then-resize (measured equivalent within bilinear rounding).

    Returns ((resize_w, resize_h), (crop_x, crop_y), ref_crop_box) where
    ref_crop_box = (ox, oy, crop_w, crop_h) in reference resized coordinates
    (exposed for fidelity tests).
    """
    rw, rh = resized_dims(orig_w, orig_h, short_side)
    base = min(rw, rh)
    crop_sizes = [int(base * s) for s in scales]
    candidates = []
    for i, ch in enumerate(crop_sizes):
        for j, cw in enumerate(crop_sizes):
            if abs(i - j) <= max_wh_scale_gap:
                candidates.append([cw, ch])
    crop_size = list(candidates[rng.integers(len(candidates))])
    for i in range(2):
        if abs(crop_size[i] - input_size) < 3:
            crop_size[i] = input_size
    crop_w, crop_h = crop_size

    offsets = _fixed_crop_offsets(rw, rh, crop_w, crop_h)[:num_fixed_crops]
    ox, oy = offsets[int(rng.integers(len(offsets)))]

    fx = input_size / crop_w
    fy = input_size / crop_h
    resize_w = int(round(rw * fx))
    resize_h = int(round(rh * fy))
    crop_x = int(round(ox * fx))
    crop_y = int(round(oy * fy))
    return (resize_w, resize_h), (crop_x, crop_y), (int(ox), int(oy), crop_w, crop_h)


def plan_bg_crop(rng, orig_w: int, orig_h: int, short_side: int, crop: int) -> tuple:
    """Uniform RandomCrop offsets over the true valid range of the resized
    background (reference comix_loader.py:72-75: Resize(short) ->
    RandomCrop(crop), offsets ~ U[0, dim - crop])."""
    rw, rh = resized_dims(orig_w, orig_h, short_side)
    bx = int(rng.integers(0, max(rw - crop, 0) + 1))
    by = int(rng.integers(0, max(rh - crop, 0) + 1))
    return bx, by


def plane_resize_taps(sw, sh, dw, dh, cx, cy, out):
    """Per-axis taps of the windowed bilinear resize — the EXACT index/weight
    math of native/decoder.cpp resize_plane_window + bilinear_resize_window_t
    (float32 half-pixel-center sampling, 8-bit fixed-point weights, clamped
    window), so a device resize driven by these taps is bit-identical to the
    host path (ops/augment.resize_plane_bilinear_taps).

    Returns a (6, out) int32 array — rows (x0, x1, xw, y0, y1, yw) — or None
    when the C++ would take the two-stage squash fallback (window larger than
    the resize target): the caller must host-resize that frame and use
    :func:`identity_plane_taps` instead."""
    cx = max(cx, 0)
    cy = max(cy, 0)
    if cx + out > dw:
        cx = dw - out
    if cy + out > dh:
        cy = dh - out
    if cx < 0 or cy < 0:
        return None
    if sw == dw and sh == dh:  # identity resize: plain crop copy
        idx = np.arange(out, dtype=np.int32)
        zero = np.zeros(out, np.int32)
        return np.stack([idx + cx, idx + cx, zero, idx + cy, idx + cy, zero])

    def axis(offset, d, s):
        ratio = np.float32(s) / np.float32(d)
        sx = (np.arange(out, dtype=np.float32) + np.float32(offset) + np.float32(0.5)) * ratio - np.float32(0.5)
        sx = np.maximum(sx, np.float32(0))
        i0 = np.minimum(sx.astype(np.int32), s - 1)
        i1 = np.minimum(i0 + 1, s - 1)
        w1 = ((sx - i0.astype(np.float32)) * np.float32(256.0) + np.float32(0.5)).astype(np.int32)
        return i0, i1, w1

    x0, x1, xw = axis(cx, dw, sw)
    y0, y1, yw = axis(cy, dh, sh)
    return np.stack([x0, x1, xw, y0, y1, yw])


def identity_plane_taps(out):
    """Taps that copy the top-left ``out`` x ``out`` corner unchanged — used
    for frames the host already resized to final geometry (squash fallback,
    non-420 files), pasted at the pad origin."""
    idx = np.arange(out, dtype=np.int32)
    zero = np.zeros(out, np.int32)
    return np.stack([idx, idx, zero, idx, idx, zero])


def _pads_from_dims(dims: np.ndarray, crop: int, max_px: int) -> Tuple[int, int]:
    """'planes'-wire pad dims for a set of stored source dims: the smallest
    16-multiple rectangle holding every source within the per-file pixel
    budget (over-budget outliers are host-resized instead of shipped, so they
    don't inflate the wire), never smaller than the crop (fallback frames are
    pasted at final geometry)."""
    served = dims[:, 0].astype(np.int64) * dims[:, 1] <= max_px
    w_need = int(dims[served, 0].max()) if served.any() else crop
    h_need = int(dims[served, 1].max()) if served.any() else crop
    return max(crop, -(-w_need // 16) * 16), max(crop, -(-h_need // 16) * 16)


def _planes_wire_core(loader, all_paths, all_dims, all_crops, src, groups, crop):
    """Shared 'planes'-wire assembly for the fast train loaders: fetch
    STORED-resolution YCbCr planes padded to the loader's fixed pad dims,
    compute ONE taps set per group of consecutive same-geometry slots
    (a clip's frames share their resize plan), and host-resize fallback
    slots — non-420 JPEGs, unreadable/oversized sources, squash geometry,
    per-frame dims deviating from the clip's probed dims — to final geometry
    at the pad origin with identity taps, so one odd file never changes any
    pixel.

    ``groups``: list of ``(slot_start, slot_count)``. Returns
    ``(y_all, c_all, taps_y (G,6,crop), taps_c (G,6,crop//2))``.
    """
    half = crop // 2

    # pad dims are fixed for the whole corpus by the loader's
    # _prepare_iteration before any worker runs; this grow only fires for
    # direct _make_batch calls outside iteration (tests). Multiples of 16
    # keep the chroma pad even; pad >= crop so fallback frames fit.
    pw, ph = _pads_from_dims(src, crop, loader.planes_max_px)
    loader._pad_w = max(loader._pad_w, pw)
    loader._pad_h = max(loader._pad_h, ph)
    pw, ph = loader._pad_w, loader._pad_h

    y_all, c_all, fdims = native.fetch_planes_batch(
        all_paths, pw, ph, num_threads=loader.num_threads
    )

    g = len(groups)
    taps_y = np.empty((g, 6, crop), np.int32)
    taps_c = np.empty((g, 6, half), np.int32)
    fb_slots: List[int] = []

    def slot_ok(i):
        return fdims[i, 0] == src[i, 0] and fdims[i, 1] == src[i, 1] and fdims[i, 0] > 0

    for gi, (start, count) in enumerate(groups):
        sw, sh = int(src[start, 0]), int(src[start, 1])
        dw, dh = int(all_dims[start, 0]), int(all_dims[start, 1])
        cx, cy = all_crops[start]
        ty = plane_resize_taps(sw, sh, dw, dh, int(cx), int(cy), crop)
        tc = plane_resize_taps(
            (sw + 1) // 2, (sh + 1) // 2, (dw + 1) // 2, (dh + 1) // 2,
            int(cx) // 2, int(cy) // 2, half,
        )
        slots = range(start, start + count)
        if ty is None or tc is None or not all(slot_ok(i) for i in slots):
            fb_slots.extend(slots)
            taps_y[gi] = identity_plane_taps(crop)
            taps_c[gi] = identity_plane_taps(half)
        else:
            taps_y[gi], taps_c[gi] = ty, tc

    if fb_slots:
        fy, fc = native.decode_yuv420_batch(
            [all_paths[i] for i in fb_slots],
            all_dims[np.array(fb_slots)],
            crop,
            [all_crops[i] for i in fb_slots],
            num_threads=loader.num_threads,
        )
        for k, i in enumerate(fb_slots):
            y_all[i][:] = 0
            y_all[i][:crop, :crop] = fy[k]
            c_all[i][:] = 0
            c_all[i][:half, :half] = fc[k]

    return y_all, c_all, taps_y, taps_c


def _parallel_ordered_iter(batches, make, num_workers: int, prefetch: int):
    """Produce ``make(*batches[i])`` from a small thread pool, yielding in
    order. Batch content is a pure function of its index tuple (per-sample
    rng is keyed on (seed, epoch, idx)), so worker assignment cannot change
    results — this only overlaps the GIL-held numpy planning of one batch
    with the GIL-released C++ decode of another. Outstanding batches are
    bounded by prefetch + num_workers."""
    if num_workers <= 1:
        num_workers = 1
    tasks = iter(enumerate(batches))
    task_lock = threading.Lock()
    sem = threading.BoundedSemaphore(max(1, prefetch) + num_workers)
    cond = threading.Condition()
    results: Dict[int, object] = {}
    error: List[BaseException] = []
    stopping = [False]  # set when the consumer exits (error / abandonment)

    def worker():
        try:
            while True:
                sem.acquire()
                if stopping[0]:
                    return
                with task_lock:
                    try:
                        i, args = next(tasks)
                    except StopIteration:
                        sem.release()
                        return
                batch = make(*args) if isinstance(args, tuple) else make(args)
                with cond:
                    results[i] = batch
                    cond.notify_all()
        except BaseException as e:  # re-raised in the consumer
            with cond:
                error.append(e)
                cond.notify_all()

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
    for th in threads:
        th.start()
    try:
        for i in range(len(batches)):
            with cond:
                while i not in results and not error:
                    # timed wait so the main thread keeps returning to the
                    # interpreter: signal handlers (the bench's cooperative
                    # quiesce, SIGUSR1) cannot run inside an untimed
                    # condition wait
                    cond.wait(timeout=0.25)
                if error:
                    raise error[0]
                batch = results.pop(i)
            sem.release()
            yield batch
        for th in threads:
            th.join()
        if error:
            raise error[0]
    finally:
        # unblock workers parked on sem.acquire if the consumer left early
        # (worker error or an abandoned generator) so they exit instead of
        # pinning decoded batches for the life of the process
        stopping[0] = True
        for _ in threads:
            try:
                sem.release()
            except ValueError:  # BoundedSemaphore already full
                break


def _fixed_crop_offsets(rw: int, rh: int, crop_w: int, crop_h: int = None) -> List:
    """The 13 MultiScaleCrop fixed offsets, in the host-transform order
    (data/transforms.py:199-219 == mmaction2)."""
    if crop_h is None:
        crop_h = crop_w
    w_step = max((rw - crop_w) // 4, 0)
    h_step = max((rh - crop_h) // 4, 0)
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
    with_bgmix: bool = True,
    dtype=None,
    wire_format: str = "rgb",
):
    """Device half of the fast path, for ``make_train_step(input_fn=...)``:
    uint8 batch dict -> augmented normalized clips, fully fused under jit.

    Order matches the reference train pipeline: RandAugment runs on decoded
    uint8 crops (before Normalize, rand_augment config position :127), then
    normalize + flip + bgmix (mutually exclusive with randAug via the masks
    the loader drew). With ``wire_format='yuv420'`` the batch carries the
    loader's YUV planes and RGB is reconstructed in-graph first
    (ops/augment.yuv420_to_rgb) — must match the loader's wire_format.
    ``with_bgmix=False`` (the empty-``bg_files`` loaders: plain-Rawframe
    train families) skips the blend entirely — the batch carries no bg
    tensors and the graph never builds the bg path."""
    import jax.numpy as jnp

    from ..ops.augment import (
        fused_train_augment,
        resize_plane_bilinear_taps,
        yuv420_to_rgb,
    )
    from ..ops.rand_augment_dev import rand_augment_batch

    def input_fn(batch):
        if wire_format == "planes":
            crop = batch["imgs_taps_y"].shape[-1]
            half = batch["imgs_taps_c"].shape[-1]
            y = resize_plane_bilinear_taps(batch["imgs_y"], batch["imgs_taps_y"], crop)
            c = resize_plane_bilinear_taps(batch["imgs_c"], batch["imgs_taps_c"], half)
            imgs_u8 = yuv420_to_rgb(y, c)
            if with_bgmix:
                bgy = resize_plane_bilinear_taps(
                    batch["bg_y"][:, None], batch["bg_taps_y"], crop
                )[:, 0]
                bgc = resize_plane_bilinear_taps(
                    batch["bg_c"][:, None], batch["bg_taps_c"], half
                )[:, 0]
                bg_u8 = yuv420_to_rgb(bgy, bgc)
        elif wire_format == "yuv420":
            imgs_u8 = yuv420_to_rgb(batch["imgs_y"], batch["imgs_c"])
            if with_bgmix:
                bg_u8 = yuv420_to_rgb(batch["bg_y"], batch["bg_c"])
        else:
            imgs_u8 = batch["imgs_u8"]
            if with_bgmix:
                bg_u8 = batch["bg_u8"]
        if with_randaug:
            augmented = rand_augment_batch(
                batch["randaug_key"], imgs_u8, n=randaug_n, m=randaug_m
            )
            sel = batch["apply_randaug"][:, None, None, None, None]
            imgs_u8 = jnp.where(sel, augmented, imgs_u8)
        out_dtype = dtype if dtype is not None else jnp.float32
        return fused_train_augment(
            imgs_u8,
            bg_u8 if with_bgmix else None,
            batch["apply_bgmix"] if with_bgmix else None,
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

    wire_format:
      * 'rgb'         — uint8 RGB crops ((B,T,c,c,3), or (B,T,5,c,c,3)
                        TenCrop; flips on device)
      * 'yuv420_full' — full-frame YUV420 wire: each frame short-side-
                        resized ONCE into fixed padded planes
                        (native.decode_yuv420_full_batch) + per-sample
                        (y, x) crop offsets; crop slicing, flips, YCbCr->RGB
                        and normalize all run on device
                        (ops/augment.eval_yuv_full_crops). Host work drops
                        to one windowed plane resize per frame and TenCrop
                        wire bytes drop ~5.6x (5 overlapping RGB crops ->
                        one ~131 KB frame) — the reference's host TenCrop
                        chain (five_crops.py + test pipeline) replaced by a
                        ship-once wire.
      * 'auto'        — 'yuv420_full' for TenCrop when the native kernel
                        provides it, else 'rgb'. CenterCrop stays on 'rgb':
                        the full-frame wire resizes ~1.7x the pixels of a
                        single 224 crop window and ships similar bytes, and
                        measured SLOWER for center (12.8 vs 22.9 videos/s,
                        round 4) while TenCrop — 5 overlapping crops
                        collapsing to one frame — measured 2.6x FASTER
                        (8.8 vs 3.4).
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
        num_workers: int = 1,
        tencrop: bool = False,
        process_index: int = None,
        process_count: int = None,
        wire_format: str = "rgb",
    ):
        if not native.available():
            raise RuntimeError("native decoder unavailable; use the standard DataLoader")
        if wire_format == "auto":
            wire_format = (
                "yuv420_full" if (tencrop and native.has_yuv420_full()) else "rgb"
            )
        if wire_format not in ("rgb", "yuv420_full"):
            raise ValueError(f"unknown eval wire_format {wire_format!r}")
        if wire_format == "yuv420_full" and not native.has_yuv420_full():
            raise RuntimeError("native decoder lacks bdvc_decode_yuv420_full_batch")
        self.wire_format = wire_format
        self._dims: Dict[str, tuple] = {}
        self._pad_w = self._pad_h = 0
        self.video_infos = list(video_infos)
        self.batch_size = batch_size  # GLOBAL batch size
        if process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_count = max(1, process_count)
        self.process_index = process_index or 0
        if self.process_count > 1:
            assert batch_size % self.process_count == 0, (batch_size, self.process_count)
        self.num_segments = num_segments
        self.crop_size = crop_size
        self.short_side = short_side
        self.filename_tmpl = filename_tmpl
        self.start_index = start_index
        # resolve the pool size here so N producer workers share the decode
        # budget instead of each opening a full-size pool (native.default_threads)
        self.num_threads = (
            num_threads if num_threads > 0 else native.default_threads(share=max(1, int(num_workers)))
        )
        self.prefetch = prefetch
        self.num_workers = max(1, int(num_workers))
        self.tencrop = tencrop  # emit (B, T, 5, c, c, 3); flips added on-device
        self.sampler = SampleFrames(
            clip_len=1, frame_interval=1, num_clips=num_segments, test_mode=True
        )

    def set_epoch(self, epoch: int) -> None:
        pass  # deterministic

    def __len__(self) -> int:
        return -(-len(self.video_infos) // self.batch_size)

    def _video_geometry(self, frame_dir: str):
        """(rw, rh) short-side-resized dims for a probed video, clamped to
        >= crop on both axes exactly like the native TenCrop kernel
        (decoder.cpp bdvc_decode_tencrop_batch rw/rh clamp)."""
        w, h = self._dims[frame_dir]
        rw, rh = resized_dims(w, h, self.short_side)
        return max(rw, self.crop_size), max(rh, self.crop_size)

    def _crop_offsets(self, rw: int, rh: int) -> np.ndarray:
        """(K, 2) int32 (y, x) luma offsets: the 5 FiveCrop positions
        (five_crops.py:42-114 / decoder.cpp tencrop offsets) or the single
        center crop."""
        crop = self.crop_size
        if self.tencrop:
            ws, hs = (rw - crop) // 4, (rh - crop) // 4
            return np.array(
                [(0, 0), (0, 4 * ws), (4 * hs, 0), (4 * hs, 4 * ws), (2 * hs, 2 * ws)],
                np.int32,
            )
        return np.array([((rh - crop) // 2, (rw - crop) // 2)], np.int32)

    def _prepare_yuv_full(self) -> None:
        """Fix the padded plane dims from the WHOLE corpus (one header probe
        per frame_dir; frames share dims) before workers spawn, so batch
        shapes are deterministic and the jitted eval step never recompiles
        mid-run (same policy as the train 'planes' wire)."""
        if self.wire_format != "yuv420_full" or self._pad_w:
            return
        probe = [
            (
                info["frame_dir"],
                osp.join(info["frame_dir"], self.filename_tmpl.format(self.start_index)),
            )
            for info in self.video_infos
        ]
        todo = [(k, p) for k, p in probe if k not in self._dims]
        if todo:
            dims = native.probe_dims_batch(
                [p for _, p in todo], num_threads=self.num_threads
            )
            for (key, _), (w, h) in zip(todo, dims):
                self._dims[key] = (int(w), int(h))
        geo = np.array(
            [self._video_geometry(info["frame_dir"]) for info in self.video_infos],
            np.int64,
        ).reshape(-1, 2)
        self._pad_w = -(-int(geo[:, 0].max()) // 16) * 16
        self._pad_h = -(-int(geo[:, 1].max()) // 16) * 16

    def _make_batch(self, indices) -> Dict[str, np.ndarray]:
        t, crop = self.num_segments, self.crop_size
        frame_paths: List[str] = []
        labels = np.empty((len(indices), 1), np.int64)
        rows = []
        for row, idx in enumerate(indices):
            info = self.video_infos[int(idx)]
            rows.append(info)
            labels[row, 0] = info["label"]
            frame_inds = self.sampler.sample(info["total_frames"]) + self.start_index
            for fi in frame_inds:
                frame_paths.append(
                    osp.join(info["frame_dir"], self.filename_tmpl.format(int(fi)))
                )
        b = len(indices)
        if self.wire_format == "yuv420_full":
            self._prepare_yuv_full()  # no-op after __iter__'s main-thread call
            geos = [self._video_geometry(info["frame_dir"]) for info in rows]
            dims = np.repeat(np.array(geos, np.int32), t, axis=0)
            y, c = native.decode_yuv420_full_batch(
                frame_paths, dims, self._pad_w, self._pad_h,
                num_threads=self.num_threads,
            )
            return {
                "imgs_y": y.reshape(b, t, self._pad_h, self._pad_w),
                "imgs_c": c.reshape(b, t, self._pad_h // 2, self._pad_w // 2, 2),
                # crop size in the key suffix: pytree keys are jit-static, so
                # the wire self-describes its geometry to the eval step
                f"crop_yx_{crop}": np.stack(
                    [self._crop_offsets(rw, rh) for rw, rh in geos]
                ),
                "label": labels,
            }
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

    @property
    def num_valid(self) -> int:
        """Dataset-order valid rows (multi-process batches are padded)."""
        return len(self.video_infos)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._prepare_yuv_full()  # pad dims fixed before workers spawn
        n = len(self.video_infos)
        if self.process_count > 1:
            # pad the global order to full batches (trimmed by run_inference
            # via num_valid) and take this process's contiguous row slice
            total = -(-n // self.batch_size) * self.batch_size
            idx = np.concatenate([np.arange(n), np.full(total - n, n - 1, np.int64)])
            per = self.batch_size // self.process_count
            lo = self.process_index * per
            batches = [b[lo : lo + per] for b in idx.reshape(-1, self.batch_size)]
        else:
            batches = [
                np.arange(n)[i : i + self.batch_size] for i in range(0, n, self.batch_size)
            ]
        yield from _parallel_ordered_iter(
            batches, self._make_batch, self.num_workers, self.prefetch
        )


class _EpochSpanMixin:
    """Shared epoch scheduling for the fast train loaders.

    ``__iter__`` yields one epoch (the torch-DataLoader-shaped contract the
    rest of the code consumes); ``iter_epochs`` chains several epochs'
    batch lists through ONE worker pool, so the producer threads and their
    prefetch depth stay hot across epoch boundaries. With few steps per
    epoch the per-epoch pool teardown + cold refill otherwise costs a full
    producer latency per epoch (measured ~150-250 ms — PERF_NOTES round 3).
    Batch content is a pure function of (seed, epoch, idx), carried per work
    item, so chaining cannot change results vs per-epoch iteration."""

    def _epoch_batches(self, epoch: int) -> List[tuple]:
        n = len(self.video_infos)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
            rng.shuffle(indices)
        batches = [
            (indices[i : i + self.batch_size], None) for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1][0]) < self.batch_size:
            batches.pop()
        elif self.pad_to_batch and batches and len(batches[-1][0]) < self.batch_size:
            # wrap-pad the short tail and mark pad rows (sample_weight 0),
            # keeping batch shapes static for jit like data/loader.py:87-96
            short = batches[-1][0]
            pad = indices[: self.batch_size - len(short)]
            while len(short) + len(pad) < self.batch_size:  # tiny datasets
                pad = np.concatenate([pad, pad])[: self.batch_size - len(short)]
            batches[-1] = (np.concatenate([short, pad]), len(short))
        if self.pad_to_batch:
            batches = [
                (idxs, np.where(np.arange(len(idxs)) < (nv if nv is not None else len(idxs)),
                                np.float32(1), np.float32(0)))
                for idxs, nv in batches
            ]
        if self.process_count > 1:
            per = self.batch_size // self.process_count
            lo = self.process_index * per
            batches = [
                (idxs[lo : lo + per], None if w is None else w[lo : lo + per])
                for idxs, w in batches
            ]
        return [(idxs, w, epoch) for idxs, w in batches]

    def _prepare_iteration(self) -> None:
        """Main-thread hook run before the worker pool spawns (state that
        must be fixed before concurrent ``_make_batch`` calls)."""

    def _prepare_planes_pad(self, extra_files=()) -> None:
        """Fix the 'planes' pad dims from the WHOLE corpus (every video's
        frame_dir — frames share dims — plus ``extra_files``) so the pad is
        a pure function of the dataset: deterministic batch shapes, no
        mid-run recompile of the jitted step, worker-count-invariant."""
        if self.wire_format != "planes" or self._pad_w:
            return
        probe = [
            (
                info["frame_dir"],
                osp.join(info["frame_dir"], self.filename_tmpl.format(self.start_index)),
            )
            for info in self.video_infos
        ] + [(p, p) for p in extra_files]
        self._get_dims(probe)
        dims = np.array([self._dims[k] for k, _ in probe], np.int64).reshape(-1, 2)
        self._pad_w, self._pad_h = _pads_from_dims(
            dims, self.crop_size, self.planes_max_px
        )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        # worker pool keeps batches decoding while the device trains on the
        # previous one; ordered reassembly preserves determinism
        self._prepare_iteration()
        yield from _parallel_ordered_iter(
            self._epoch_batches(self.epoch), self._make_batch, self.num_workers, self.prefetch
        )

    def iter_epochs(self, first_epoch: int, num_epochs: int) -> Iterator[Dict[str, np.ndarray]]:
        """Chain ``num_epochs`` epochs (starting at ``first_epoch``) through
        one continuous producer stream; ``len(self)`` batches per epoch."""
        self._prepare_iteration()
        work = [
            item
            for e in range(first_epoch, first_epoch + num_epochs)
            for item in self._epoch_batches(e)
        ]
        yield from _parallel_ordered_iter(
            work, self._make_batch, self.num_workers, self.prefetch
        )


class FastBGMixLoader(_EpochSpanMixin):
    """Batched uint8 producer over a BackgroundMixDataset-shaped corpus."""

    def __init__(
        self,
        video_infos: Sequence[dict],
        bg_files: Sequence[str],
        batch_size: int,
        num_segments: int = 8,
        crop_size: int = 224,
        short_side: int = None,  # train Resize(-1, S); default crop/0.875
        msc_scales=MSC_SCALES,
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
        pad_to_batch: bool = False,  # wrap-pad the tail; emits sample_weight
        prefetch: int = 2,
        num_workers: int = 1,
        process_index: int = None,
        process_count: int = None,
        wire_format: str = "rgb",  # 'rgb' | 'yuv420' | 'planes' | 'auto'
    ):
        if not native.available():
            raise RuntimeError("native decoder unavailable; use the standard DataLoader")
        self.wire_format = resolve_wire_format(wire_format, crop_size)
        self.video_infos = list(video_infos)
        self.bg_files = list(bg_files)
        self.batch_size = batch_size  # GLOBAL batch size
        # multi-process slicing, same contract as data/loader.py DataLoader
        if process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_count = max(1, process_count)
        self.process_index = process_index or 0
        if self.process_count > 1:
            assert batch_size % self.process_count == 0, (batch_size, self.process_count)
            self.pad_to_batch = pad_to_batch = pad_to_batch or not drop_last
        self.num_segments = num_segments
        self.crop_size = crop_size
        # reference configs pair MultiScaleCrop(input) with Resize(-1, S)
        # where input/S = 0.875 (224/256, 56/64 in the tests)
        self.short_side = short_side or int(round(crop_size / 0.875))
        self.msc_scales = tuple(msc_scales)
        self.bg_short_side = bg_short_side
        self.filename_tmpl = filename_tmpl
        self.start_index = start_index
        self.randaug_prob = randaug_prob
        self.bgmix_prob = bgmix_prob
        self.with_randaug_mutex = with_randaug_mutex
        self.flip_ratio = flip_ratio
        self.shuffle = shuffle
        self.seed = seed
        # resolve the pool size here so N producer workers share the decode
        # budget instead of each opening a full-size pool (native.default_threads)
        self.num_threads = (
            num_threads if num_threads > 0 else native.default_threads(share=max(1, int(num_workers)))
        )
        self.drop_last = drop_last
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch
        self.num_workers = max(1, int(num_workers))
        self.epoch = 0
        self.sampler = SampleFrames(clip_len=1, frame_interval=1, num_clips=num_segments)
        # original (w, h) per frame_dir / bg file, probed from JPEG headers
        # once and cached; frames within one video share dimensions (same
        # assumption mmaction2 pipelines make via the clip-wide img_shape)
        self._dims: Dict[str, tuple] = {}
        # 'planes' wire: running pad dims (never shrink — a growing pad is a
        # one-off recompile of the jitted step) and the per-file pixel cap
        # above which a source is host-resized instead of shipped at stored
        # resolution (keeps the wire bounded for outlier-sized sources)
        self._pad_w = self._pad_h = 0
        import os as _os

        self.planes_max_px = int(_os.environ.get("BDVC_PLANES_MAX_PX", str(512 * 512)))

    def _get_dims(self, keys_and_paths: List) -> None:
        """Probe original dims for any (cache_key, jpeg_path) not yet seen."""
        todo = [(k, p) for k, p in keys_and_paths if k not in self._dims]
        if not todo:
            return
        dims = native.probe_dims_batch([p for _, p in todo], num_threads=self.num_threads)
        for (key, _), (w, h) in zip(todo, dims):
            self._dims[key] = (int(w), int(h))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _prepare_iteration(self) -> None:
        """Fix the 'planes' pad dims on the main thread, from the WHOLE
        corpus, before the worker pool spawns: concurrent ``_make_batch``
        calls growing a shared running pad would make batch shapes
        non-monotonic and worker-count-dependent. Probing every video (one
        header per frame_dir — frames share dims) + bg file keeps the pad a
        pure function of the dataset, so shapes are deterministic and there
        is never a mid-run recompile of the jitted step."""
        self._prepare_planes_pad(extra_files=self.bg_files)

    def __len__(self) -> int:
        n = len(self.video_infos)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _make_planes_wire(
        self, b, t, crop, indices, all_paths, all_dims, all_crops, with_bg=True
    ):
        """'planes' wire: ship STORED-resolution YCbCr planes + per-clip
        resize taps; the windowed bilinear resize runs on the MXU
        (ops/augment.resize_plane_bilinear_taps), bit-identical to the host
        C++ path. Frames the stored-plane form cannot serve are host-resized
        to final geometry and given identity taps (see _planes_wire_core).
        ``with_bg=False`` (empty bg_files) ships frame planes only."""
        n = b * t + (b if with_bg else 0)

        # per-slot source dims (frames share their video's probed dims)
        src = np.empty((n, 2), np.int32)
        for row, idx in enumerate(indices):
            src[row * t : (row + 1) * t] = self._dims[self.video_infos[int(idx)]["frame_dir"]]
        groups = [(row * t, t) for row in range(b)]
        if with_bg:
            for row in range(b):
                src[b * t + row] = self._dims[all_paths[b * t + row]]
            groups += [(b * t + row, 1) for row in range(b)]
        y_all, c_all, taps_y, taps_c = _planes_wire_core(
            self, all_paths, all_dims, all_crops, src, groups, crop
        )
        pw, ph = self._pad_w, self._pad_h

        pixels = {
            "imgs_y": y_all[: b * t].reshape(b, t, ph, pw),
            "imgs_c": c_all[: b * t].reshape(b, t, ph // 2, pw // 2, 2),
            "imgs_taps_y": taps_y[:b],
            "imgs_taps_c": taps_c[:b],
        }
        if with_bg:
            pixels.update(
                bg_y=y_all[b * t :],
                bg_c=c_all[b * t :],
                bg_taps_y=taps_y[b:],
                bg_taps_c=taps_c[b:],
            )
        return pixels

    # -- batch assembly ----------------------------------------------------
    def _make_batch(
        self, indices: np.ndarray, weights: np.ndarray = None, epoch: int = None
    ) -> Dict[str, np.ndarray]:
        epoch = self.epoch if epoch is None else int(epoch)
        profile = _producer_profiling_enabled()
        if profile:
            import time

            t_start = time.perf_counter()
        b = len(indices)
        t = self.num_segments
        crop = self.crop_size
        # plain-Rawframe families ride this loader with an empty bg list:
        # no background exists to blend, so skip the placeholder bg decode
        # and ship no bg tensors at all (make_fast_input_fn with_bgmix=False)
        no_bg = not self.bg_files

        frame_paths: List[str] = []
        crops: List = []
        resize_dims = np.empty((b * t, 2), np.int32)
        labels = np.empty((b, 1), np.int64)
        flip = np.empty(b, bool)
        apply_bgmix = np.empty(b, bool)
        bg_paths: List[str] = []
        bg_crops: List = []

        apply_randaug = np.zeros(b, bool)
        randaug_keys = np.empty((b, 2), np.uint32)

        # pass 1: per-sample decisions + frame selection; collect the paths
        # whose original dims we need so one header-probe call covers them all
        rngs = []
        row_frame_inds = []
        probe: List = []
        for row, idx in enumerate(indices):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, int(idx), 7])
            )
            rngs.append(rng)
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

            frame_inds = self.sampler.sample(info["total_frames"], rng) + self.start_index
            row_frame_inds.append(frame_inds)
            probe.append((
                info["frame_dir"],
                osp.join(info["frame_dir"], self.filename_tmpl.format(int(frame_inds[0]))),
            ))

            if no_bg:
                apply_bgmix[row] = False
                continue
            if apply_bgmix[row]:
                bg_path = self.bg_files[int(rng.integers(len(self.bg_files)))]
            else:
                # placeholder (not blended); reuse a frame of this video —
                # keeps the bg tensor shapes static across batches
                bg_path = probe[-1][1]
            bg_paths.append(bg_path)
            probe.append((bg_path, bg_path))
        if profile:
            t_pass1 = time.perf_counter()
        self._get_dims(probe)
        if profile:
            t_probe = time.perf_counter()

        # pass 2: whole-clip crop geometry on the true resized dims of each
        # image — the exact MultiScaleCrop crop-box distribution, realized as
        # a per-clip anisotropic resize + fixed crop (plan_train_geometry)
        for row, idx in enumerate(indices):
            rng = rngs[row]
            info = self.video_infos[int(idx)]
            vw, vh = self._dims[info["frame_dir"]]
            (rw, rh), (ox, oy), _ = plan_train_geometry(
                rng, vw, vh, input_size=crop, short_side=self.short_side,
                scales=self.msc_scales,
            )
            for k, fi in enumerate(row_frame_inds[row]):
                frame_paths.append(osp.join(info["frame_dir"], self.filename_tmpl.format(int(fi))))
                crops.append((ox, oy))
                resize_dims[row * t + k] = (rw, rh)

            if no_bg:
                continue
            # uniform bg RandomCrop over the true valid range
            bw, bh = self._dims[bg_paths[row]]
            bg_crops.append(plan_bg_crop(rng, bw, bh, self.bg_short_side, crop))

        # one decode-pool call for frames AND backgrounds: the bg short-side
        # resize is expressed through the same explicit-dims kernel
        # (resized_dims matches the decoder's short-side computation), so the
        # pixels are identical and the small bg batch overlaps the frame
        # decode instead of paying a second pool ramp
        bg_dims = np.array(
            [resized_dims(*self._dims[p], self.bg_short_side) for p in bg_paths],
            np.int32,
        ).reshape(-1, 2)
        if profile:
            t_plan = time.perf_counter()
        all_paths = frame_paths + bg_paths
        all_dims = np.concatenate([resize_dims, bg_dims])
        all_crops = crops + bg_crops
        if self.wire_format == "planes":
            pixels = self._make_planes_wire(
                b, t, crop, indices, all_paths, all_dims, all_crops, with_bg=not no_bg
            )
        elif self.wire_format == "yuv420":
            y, c = native.decode_yuv420_batch(
                all_paths, all_dims, crop, all_crops, num_threads=self.num_threads
            )
            half = crop // 2
            pixels = {
                "imgs_y": y[: b * t].reshape(b, t, crop, crop),
                "imgs_c": c[: b * t].reshape(b, t, half, half, 2),
            }
            if not no_bg:
                pixels.update(bg_y=y[b * t :], bg_c=c[b * t :])
        else:
            dec = native.decode_resize2_crop_batch(
                all_paths,
                all_dims,
                out_h=crop,
                out_w=crop,
                crops=all_crops,
                num_threads=self.num_threads,
            )
            pixels = {"imgs_u8": dec[: b * t].reshape(b, t, crop, crop, 3)}
            if not no_bg:
                pixels["bg_u8"] = dec[b * t :]
        if profile:
            t_dec = time.perf_counter()
            _record_producer_phases(
                pass1=t_pass1 - t_start,
                probe=t_probe - t_pass1,
                pass2=t_plan - t_probe,
                decode=t_dec - t_plan,
            )

        out = {
            **pixels,
            "apply_bgmix": apply_bgmix,
            "apply_randaug": apply_randaug,
            "randaug_key": randaug_keys,
            "flip": flip,
            "label": labels,
        }
        if weights is not None:
            out["sample_weight"] = weights
        return out

def transform_acm_boxes(
    dets: np.ndarray, orig_w: int, orig_h: int, short_side: int, out_size: int, flip: bool
) -> np.ndarray:
    """Carry (N, 4) float boxes through the reference ACM geometry chain —
    ResizeWithBox(-1, short) -> FlipWithBox -> ResizeWithBox((out, out),
    keep_ratio=False) (datasets.py ActorCutMixDataset pipelines; float32
    multiply + clip per stage exactly like box.py:123-126, 195-204)."""
    cur = np.asarray(dets, dtype=np.float32).reshape(-1, 4).copy()
    rw, rh = resized_dims(orig_w, orig_h, short_side)
    s1 = np.array([rw / orig_w, rh / orig_h], dtype=np.float32)
    cur[:, 0::2] = np.clip(cur[:, 0::2] * s1[0], 0, rw)
    cur[:, 1::2] = np.clip(cur[:, 1::2] * s1[1], 0, rh)
    if flip:
        x0 = rw - cur[:, 2].copy()
        cur[:, 2] = rw - cur[:, 0]
        cur[:, 0] = x0
    s2 = np.array([out_size / rw, out_size / rh], dtype=np.float32)
    cur[:, 0::2] = np.clip(cur[:, 0::2] * s2[0], 0, out_size)
    cur[:, 1::2] = np.clip(cur[:, 1::2] * s2[1], 0, out_size)
    return cur


def _rasterized_union_area(boxes: np.ndarray, h: int, w: int) -> int:
    """Pixel count of the union of int-truncated half-open boxes — the same
    rasterization ops/augment.boxes_union_mask performs on device and the
    reference's numpy slicing performs on host (box.py:97-99)."""
    mask = np.zeros((h, w), dtype=bool)
    for x0, y0, x1, y1 in boxes.astype(int):
        mask[y0:y1, x0:x1] = True
    return int(mask.sum())


class FastACMLoader(_EpochSpanMixin):
    """Batched uint8 producer over an ActorCutMixDataset-shaped corpus.

    Host side decodes BOTH the action clip and the scene clip straight to the
    output square via the native decoder and carries the human boxes through
    the reference geometry chain (transform_acm_boxes); masking/cutout/
    compositing runs fused on device (ops/augment.acm_composite inside
    make_fast_acm_input_fn). Per the reference (actor_cut_mix_loader.py:
    117-133), with probability ``acm_prob`` a sample is the ACM composite of
    its clip with a random scene video; otherwise the clip goes through
    RandAugment (prob 1) + MultiScaleCrop — realized as the fast-path MSC
    plan + device RandAugment, like FastBGMixLoader.

    Emits {'imgs_u8' (B,T,S,S,3) u8, 'scene_u8' (B,T,S,S,3) u8,
    'actor_boxes'/'scene_boxes' (B,T,K,4) f32, 'actor_full_mask' (B,) bool,
    'apply_acm'/'apply_randaug'/'actor_flip'/'scene_flip' (B,) bool,
    'randaug_key' (B,2) u32, 'label' (B,1) i64, 'foreground_ratio' (B,) f32,
    'background_label' (B,1) i64, 'sample_weight' (B,) f32 when padded}.
    With ``wire_format='yuv420'`` the two pixel tensors are replaced by
    'imgs_y'/'imgs_c' + 'scene_y'/'scene_c' (half the wire bytes; the input
    fn reconstructs RGB in-graph — see resolve_wire_format). With
    ``'planes'`` both streams ship STORED-resolution planes plus per-clip
    taps ('imgs_taps_*'/'scene_taps_*') and the windowed resize runs on the
    MXU, so a warm plane-cache epoch costs the host only memcpys.

    ACM rows decode 2 clips, so host decode demand is ~2x the BGMix family's;
    non-ACM rows get a zeros scene placeholder (masked out on device).
    """

    def __init__(
        self,
        video_infos: Sequence[dict],
        batch_size: int,
        num_segments: int = 8,
        crop_size: int = 224,
        short_side: int = 256,
        msc_scales=MSC_SCALES,
        det_thres: float = 0.4,
        acm_prob: float = 1.0,
        flip_ratio: float = 0.5,
        max_boxes: int = None,  # None -> sized to the corpus's densest frame
        filename_tmpl: str = "img_{:05}.jpg",
        start_index: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        num_threads: int = 0,
        drop_last: bool = True,
        pad_to_batch: bool = False,
        prefetch: int = 2,
        num_workers: int = 1,
        process_index: int = None,
        process_count: int = None,
        wire_format: str = "rgb",  # 'rgb' | 'yuv420' | 'planes' | 'auto'
    ):
        if not native.available():
            raise RuntimeError("native decoder unavailable; use the standard DataLoader")
        self.wire_format = resolve_wire_format(wire_format, crop_size)
        self.video_infos = list(video_infos)
        self.batch_size = batch_size
        if process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        self.process_count = max(1, process_count)
        self.process_index = process_index or 0
        if self.process_count > 1:
            assert batch_size % self.process_count == 0, (batch_size, self.process_count)
            pad_to_batch = pad_to_batch or not drop_last
        self.num_segments = num_segments
        self.crop_size = crop_size
        self.short_side = short_side
        self.msc_scales = tuple(msc_scales)
        self.det_thres = det_thres
        self.acm_prob = acm_prob
        self.flip_ratio = flip_ratio
        # static per-frame box capacity: the device mask kernel needs a fixed
        # K, but truncating real detections would silently diverge from the
        # reference's rasterize-every-box semantics — so default to the
        # densest above-threshold frame in this corpus (>=1)
        if max_boxes is None:
            max_boxes = 1
            for info in self.video_infos:
                all_dets = info.get("all_detections") or {}
                frames = all_dets.values() if hasattr(all_dets, "values") else all_dets
                for dets in frames:
                    if len(dets):
                        d = np.asarray(dets, np.float32).reshape(-1, 5)
                        max_boxes = max(max_boxes, int((d[:, -1] > det_thres).sum()))
        self.max_boxes = max_boxes
        self.filename_tmpl = filename_tmpl
        self.start_index = start_index
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = (
            num_threads if num_threads > 0 else native.default_threads(share=max(1, int(num_workers)))
        )
        self.drop_last = drop_last
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch
        self.num_workers = max(1, int(num_workers))
        self.epoch = 0
        self.sampler = SampleFrames(clip_len=1, frame_interval=1, num_clips=num_segments)
        self._dims: Dict[str, tuple] = {}
        # 'planes' wire state — same contract as FastBGMixLoader
        self._pad_w = self._pad_h = 0
        import os as _os

        self.planes_max_px = int(_os.environ.get("BDVC_PLANES_MAX_PX", str(512 * 512)))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _prepare_iteration(self) -> None:
        """Fix 'planes' pad dims from the WHOLE corpus on the main thread
        before workers spawn (scene clips are drawn from the same corpus, so
        one probe covers both streams) — see FastBGMixLoader._prepare_iteration
        for why the pad must be a pure function of the dataset."""
        self._prepare_planes_pad()

    def __len__(self) -> int:
        n = len(self.video_infos)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # -- per-clip helpers ---------------------------------------------------
    def _clip_dets(self, info: dict, frame_inds) -> List[np.ndarray]:
        """Thresholded (N, 4) float boxes per sampled frame (DetectionLoad
        semantics, box.py:28-41; frame_inds carry start_index like the host
        transform stack)."""
        out = []
        all_dets = info.get("all_detections")
        for fi in frame_inds:
            cur = all_dets[int(fi)] if all_dets is not None else []
            cur = (
                np.asarray(cur, dtype=np.float32).reshape(-1, 5)
                if len(cur)
                else np.zeros((0, 5), np.float32)
            )
            out.append(cur[cur[:, -1] > self.det_thres, :4].copy())
        return out

    def _boxes_tensor(self, dets_per_frame: List[np.ndarray]) -> np.ndarray:
        t, k = self.num_segments, self.max_boxes
        boxes = np.zeros((t, k, 4), np.float32)
        for fi, b in enumerate(dets_per_frame):
            m = min(len(b), k)
            boxes[fi, :m] = b[:m]
        return boxes

    # -- batch assembly ----------------------------------------------------
    def _make_batch(
        self, indices: np.ndarray, weights: np.ndarray = None, epoch: int = None
    ) -> Dict[str, np.ndarray]:
        epoch = self.epoch if epoch is None else int(epoch)
        b, t, crop = len(indices), self.num_segments, self.crop_size
        k = self.max_boxes

        labels = np.empty((b, 1), np.int64)
        bg_labels = np.full((b, 1), -1, np.int64)
        fg_ratio = np.ones(b, np.float32)
        apply_acm = np.zeros(b, bool)
        actor_flip = np.zeros(b, bool)
        scene_flip = np.zeros(b, bool)
        actor_full_mask = np.zeros(b, bool)
        randaug_keys = np.zeros((b, 2), np.uint32)
        actor_boxes = np.zeros((b, t, k, 4), np.float32)
        scene_boxes = np.zeros((b, t, k, 4), np.float32)

        rows = []  # (row, info, frame_inds, scene_info, scene_frame_inds | None)
        probe: List = []
        for row, idx in enumerate(indices):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, int(idx), 9])
            )
            info = self.video_infos[int(idx)]
            labels[row, 0] = info["label"]
            fire = rng.random() < self.acm_prob
            apply_acm[row] = fire
            frame_inds = self.sampler.sample(info["total_frames"], rng) + self.start_index
            first = osp.join(info["frame_dir"], self.filename_tmpl.format(int(frame_inds[0])))
            probe.append((info["frame_dir"], first))
            if fire:
                actor_flip[row] = rng.random() < self.flip_ratio
                scene_idx = int(rng.integers(len(self.video_infos)))
                scene_info = self.video_infos[scene_idx]
                scene_frame_inds = (
                    self.sampler.sample(scene_info["total_frames"], rng) + self.start_index
                )
                scene_flip[row] = rng.random() < self.flip_ratio
                bg_labels[row, 0] = scene_info["label"]
                probe.append((
                    scene_info["frame_dir"],
                    osp.join(
                        scene_info["frame_dir"],
                        self.filename_tmpl.format(int(scene_frame_inds[0])),
                    ),
                ))
                # drawn last so earlier draws keep their values; ACM rows'
                # output is masked, but distinct keys keep the device
                # equalize-bucket compaction from seeing B identical op draws
                randaug_keys[row] = rng.integers(0, 2**32, size=2, dtype=np.uint32)
                rows.append((row, info, frame_inds, rng, scene_info, scene_frame_inds))
            else:
                randaug_keys[row] = rng.integers(0, 2**32, size=2, dtype=np.uint32)
                rows.append((row, info, frame_inds, rng, None, None))
        self._get_dims(probe)

        frame_paths: List[str] = []
        crops: List = []
        resize_dims = np.empty((b * t, 2), np.int32)
        scene_rows: List = []  # (row, paths) for the second decode
        scene_src: List = []  # (w, h) probed dims per scene row ('planes' wire)
        for row, info, frame_inds, rng, scene_info, scene_frame_inds in rows:
            vw, vh = self._dims[info["frame_dir"]]
            if apply_acm[row]:
                # ACM geometry: Resize(-1, S) -> Resize((crop, crop)) is one
                # direct anisotropic resize; boxes ride the exact two-stage
                # float chain (transform_acm_boxes)
                rdims, off = (crop, crop), (0, 0)
                dets = self._clip_dets(info, frame_inds)
                n_dets = sum(len(d) for d in dets)
                actor_full_mask[row] = n_dets == 0
                tb = np.zeros((t, k, 4), np.float32)
                for fi, d in enumerate(dets):
                    tbf = transform_acm_boxes(
                        d, vw, vh, self.short_side, crop, bool(actor_flip[row])
                    )
                    m = min(len(tbf), k)
                    tb[fi, :m] = tbf[:m]
                actor_boxes[row] = tb
                # foreground_ratio: all-ones mask when the clip has no dets
                # (BuildHumanMask special case); else rasterized union area
                if n_dets == 0:
                    fg_ratio[row] = 1.0
                else:
                    area = sum(
                        _rasterized_union_area(tb[fi, : min(len(dets[fi]), k)], crop, crop)
                        for fi in range(t)
                    )
                    fg_ratio[row] = area / float(t * crop * crop)

                sw, sh = self._dims[scene_info["frame_dir"]]
                sdets = self._clip_dets(scene_info, scene_frame_inds)
                stb = np.zeros((t, k, 4), np.float32)
                for fi, d in enumerate(sdets):
                    sbf = transform_acm_boxes(
                        d, sw, sh, self.short_side, crop, bool(scene_flip[row])
                    )
                    m = min(len(sbf), k)
                    stb[fi, :m] = sbf[:m]
                scene_boxes[row] = stb
                scene_rows.append((
                    row,
                    [
                        osp.join(scene_info["frame_dir"], self.filename_tmpl.format(int(fi)))
                        for fi in scene_frame_inds
                    ],
                ))
                scene_src.append((sw, sh))
            else:
                rdims, off, _ = plan_train_geometry(
                    rng, vw, vh, input_size=crop, short_side=self.short_side,
                    scales=self.msc_scales,
                )
            for j, fi in enumerate(frame_inds):
                frame_paths.append(
                    osp.join(info["frame_dir"], self.filename_tmpl.format(int(fi)))
                )
                crops.append(off)
                resize_dims[row * t + j] = rdims

        # one decode-pool call for actor frames AND scene frames (scene rows
        # appended after the b*t frame block, same trick as FastBGMixLoader's
        # merged frame+bg call); non-ACM rows get a zeros placeholder that the
        # device masks out (a memset, not a 19 MB memcpy of the frame tensor)
        spaths = [p for _, paths in scene_rows for p in paths]
        all_paths = frame_paths + spaths
        all_dims = np.concatenate(
            [resize_dims, np.tile(np.array([crop, crop], np.int32), (len(spaths), 1))]
        )
        all_crops = crops + [(0, 0)] * len(spaths)
        if self.wire_format == "planes":
            # STORED-resolution planes + per-clip taps for BOTH streams; the
            # device resizes on the MXU then composites. Scene-less rows ship
            # zero planes + identity taps (masked out on device either way).
            half = crop // 2
            n_scene = len(scene_rows)
            src = np.empty((b * t + n_scene * t, 2), np.int32)
            for row, idx in enumerate(indices):
                src[row * t : (row + 1) * t] = self._dims[
                    self.video_infos[int(idx)]["frame_dir"]
                ]
            for i, (sw, sh) in enumerate(scene_src):
                src[b * t + i * t : b * t + (i + 1) * t] = (sw, sh)
            groups = [(row * t, t) for row in range(b)] + [
                (b * t + i * t, t) for i in range(n_scene)
            ]
            y_all, c_all, taps_y, taps_c = _planes_wire_core(
                self, all_paths, all_dims, all_crops, src, groups, crop
            )
            pw, ph = self._pad_w, self._pad_h
            scene_y = np.zeros((b, t, ph, pw), np.uint8)
            scene_c = np.zeros((b, t, ph // 2, pw // 2, 2), np.uint8)
            scene_ty = np.tile(identity_plane_taps(crop)[None], (b, 1, 1))
            scene_tc = np.tile(identity_plane_taps(half)[None], (b, 1, 1))
            if n_scene:
                sy = y_all[b * t :].reshape(n_scene, t, ph, pw)
                sc = c_all[b * t :].reshape(n_scene, t, ph // 2, pw // 2, 2)
                for i, (row, _) in enumerate(scene_rows):
                    scene_y[row] = sy[i]
                    scene_c[row] = sc[i]
                    scene_ty[row] = taps_y[b + i]
                    scene_tc[row] = taps_c[b + i]
            pixels = {
                "imgs_y": y_all[: b * t].reshape(b, t, ph, pw),
                "imgs_c": c_all[: b * t].reshape(b, t, ph // 2, pw // 2, 2),
                "imgs_taps_y": taps_y[:b],
                "imgs_taps_c": taps_c[:b],
                "scene_y": scene_y,
                "scene_c": scene_c,
                "scene_taps_y": scene_ty,
                "scene_taps_c": scene_tc,
            }
        elif self.wire_format == "yuv420":
            half = crop // 2
            y, c = native.decode_yuv420_batch(
                all_paths, all_dims, crop, all_crops, num_threads=self.num_threads
            )
            scene_y = np.zeros((b, t, crop, crop), np.uint8)
            scene_c = np.zeros((b, t, half, half, 2), np.uint8)
            if scene_rows:
                sy = y[b * t :].reshape(len(scene_rows), t, crop, crop)
                sc = c[b * t :].reshape(len(scene_rows), t, half, half, 2)
                for i, (row, _) in enumerate(scene_rows):
                    scene_y[row] = sy[i]
                    scene_c[row] = sc[i]
            pixels = {
                "imgs_y": y[: b * t].reshape(b, t, crop, crop),
                "imgs_c": c[: b * t].reshape(b, t, half, half, 2),
                "scene_y": scene_y,
                "scene_c": scene_c,
            }
        else:
            dec = native.decode_resize2_crop_batch(
                all_paths, all_dims, out_h=crop, out_w=crop, crops=all_crops,
                num_threads=self.num_threads,
            )
            imgs = dec[: b * t].reshape(b, t, crop, crop, 3)
            scene = np.zeros_like(imgs)
            if scene_rows:
                sdec = dec[b * t :].reshape(len(scene_rows), t, crop, crop, 3)
                for i, (row, _) in enumerate(scene_rows):
                    scene[row] = sdec[i]
            pixels = {"imgs_u8": imgs, "scene_u8": scene}

        out = {
            **pixels,
            "actor_boxes": actor_boxes,
            "scene_boxes": scene_boxes,
            "actor_full_mask": actor_full_mask,
            "apply_acm": apply_acm,
            "apply_randaug": ~apply_acm,
            "actor_flip": actor_flip,
            "scene_flip": scene_flip,
            "randaug_key": randaug_keys,
            "label": labels,
            "foreground_ratio": fg_ratio,
            "background_label": bg_labels,
        }
        if weights is not None:
            out["sample_weight"] = weights
        return out

    _get_dims = FastBGMixLoader._get_dims


def make_fast_acm_input_fn(
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
    randaug_n: int = 2,
    randaug_m: int = 10,
    fill: int = 127,
    dtype=None,
    wire_format: str = "rgb",
):
    """Device half of the fast ActorCutMix path: uint8 batch dict ->
    normalized clips, fully fused under jit. Non-ACM rows get RandAugment
    (prob 1, reference actor_cut_mix_loader.py:92-103); ACM rows get
    per-clip flips then the box-mask composite (ops/augment.acm_composite).
    With ``wire_format='yuv420'`` the batch carries the loader's YUV planes
    and both clips' RGB is reconstructed in-graph first; with ``'planes'``
    both streams are tap-resized on the MXU before reconstruction — must
    match the loader's wire_format."""
    import jax
    import jax.numpy as jnp

    from ..ops.augment import (
        acm_composite,
        normalize_batch,
        resize_plane_bilinear_taps,
        yuv420_to_rgb,
    )
    from ..ops.rand_augment_dev import rand_augment_batch

    def input_fn(batch):
        if wire_format == "planes":
            crop = batch["imgs_taps_y"].shape[-1]
            half = batch["imgs_taps_c"].shape[-1]
            y = resize_plane_bilinear_taps(batch["imgs_y"], batch["imgs_taps_y"], crop)
            c = resize_plane_bilinear_taps(batch["imgs_c"], batch["imgs_taps_c"], half)
            imgs = yuv420_to_rgb(y, c)
            sy = resize_plane_bilinear_taps(batch["scene_y"], batch["scene_taps_y"], crop)
            sc = resize_plane_bilinear_taps(batch["scene_c"], batch["scene_taps_c"], half)
            scene_u8 = yuv420_to_rgb(sy, sc)
        elif wire_format == "yuv420":
            imgs = yuv420_to_rgb(batch["imgs_y"], batch["imgs_c"])
            scene_u8 = yuv420_to_rgb(batch["scene_y"], batch["scene_c"])
        else:
            imgs = batch["imgs_u8"]
            scene_u8 = batch["scene_u8"]

        # RandAugment only touches non-ACM rows; with acm_prob=1.0 (the
        # reference default) every row is ACM, so skip the whole ~30 ms
        # augment pass at runtime (both cond branches compile once)
        augmented = jax.lax.cond(
            jnp.any(batch["apply_randaug"]),
            lambda keys, x: rand_augment_batch(keys, x, n=randaug_n, m=randaug_m),
            lambda keys, x: x,
            batch["randaug_key"], imgs,
        )
        sel_ra = batch["apply_randaug"][:, None, None, None, None]
        imgs_ra = jnp.where(sel_ra, augmented, imgs)

        def flip_clips(x, f):
            return jnp.where(f[:, None, None, None, None], x[:, :, :, ::-1, :], x)

        actor = flip_clips(imgs, batch["actor_flip"])
        scene = flip_clips(scene_u8, batch["scene_flip"])
        acm = acm_composite(
            actor, scene, batch["actor_boxes"], batch["scene_boxes"],
            batch["actor_full_mask"], fill=fill,
        )
        sel_acm = batch["apply_acm"][:, None, None, None, None]
        out_u8 = jnp.where(sel_acm, acm, imgs_ra)
        out_dtype = dtype if dtype is not None else jnp.float32
        return normalize_batch(out_u8, mean, std, out_dtype)

    return input_fn
