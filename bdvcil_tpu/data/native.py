"""ctypes binding for the native C++ decode kernel (native/decoder.cpp).

Builds ``libbdvcdec.so`` on first use (g++ + libjpeg, both baked into the
image) and exposes:

  * ``decode_file(path)`` — full decode to an HWC uint8 array
  * ``decode_resize_crop_batch(paths, short_side, out_h, out_w, crops)`` —
    the batched fast path: DCT-scaled decode + short-side resize + crop into
    one dense uint8 batch, parallelized over a C++ thread pool.

``available()`` gates everything; callers fall back to the cv2 host pipeline
when the native library cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libbdvcdec.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB_PATH.exists() and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None
        lib.bdvc_version.restype = ctypes.c_int
        lib.bdvc_decode_file.restype = ctypes.c_int
        lib.bdvc_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.bdvc_decode_resize_crop_batch.restype = ctypes.c_int
        lib.bdvc_decode_resize_crop_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.bdvc_decode_tencrop_batch.restype = ctypes.c_int
        lib.bdvc_decode_tencrop_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        if hasattr(lib, "bdvc_decode_resize2_crop_batch"):
            lib.bdvc_decode_resize2_crop_batch.restype = ctypes.c_int
            lib.bdvc_decode_resize2_crop_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
        if hasattr(lib, "bdvc_decode_yuv420_batch"):
            lib.bdvc_decode_yuv420_batch.restype = ctypes.c_int
            lib.bdvc_decode_yuv420_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
        if hasattr(lib, "bdvc_decode_yuv420_full_batch"):
            lib.bdvc_decode_yuv420_full_batch.restype = ctypes.c_int
            lib.bdvc_decode_yuv420_full_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
        if hasattr(lib, "bdvc_fetch_planes_batch"):
            lib.bdvc_fetch_planes_batch.restype = ctypes.c_int
            lib.bdvc_fetch_planes_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
        if hasattr(lib, "bdvc_cache_stats"):
            lib.bdvc_cache_stats.restype = None
            lib.bdvc_cache_stats.argtypes = [ctypes.POINTER(ctypes.c_long)] * 4
            lib.bdvc_cache_clear.restype = None
            lib.bdvc_cache_clear.argtypes = []
            lib.bdvc_cache_set_budget_mb.restype = None
            lib.bdvc_cache_set_budget_mb.argtypes = [ctypes.c_long]
        if hasattr(lib, "bdvc_probe_dims_batch"):
            lib.bdvc_probe_dims_batch.restype = ctypes.c_int
            lib.bdvc_probe_dims_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def default_threads(share: int = 1) -> int:
    """Decode-pool size when the caller passes num_threads<=0.

    ``os.cpu_count()`` under-reports inside cgroup-limited containers (this
    dev box reports 1 while its quota sustains ~4-5 cores), so a reported
    count <= 2 is treated as "unknown, assume a ~4-core quota". The floor is
    4, NOT higher: the decode pool competes with the latency-critical
    device_put / dispatch path for the same quota, and oversubscribing it
    measurably LOSES end to end once the decoded-plane cache makes warm
    epochs cheap (PERF_NOTES "Round 3": e2e 76.6 clips/s at 4 threads vs
    68.1 at 8 on this box; cold decode itself peaks near 2 threads). Hosts
    with a truthful affinity mask (real v5e VMs report ~26 vCPU/chip) size
    by the mask, and BDVC_DECODE_THREADS overrides everything.

    ``share``: number of concurrent decode call sites that will each size a
    pool this way (the fast loaders pass their ``num_workers``) — the budget
    is divided so N producer workers don't run N full-size pools.
    BDVC_DECODE_THREADS bypasses the division (it is a per-pool override).
    """
    env = os.environ.get("BDVC_DECODE_THREADS")
    if env:
        return max(1, int(env))
    try:
        n = len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        n = os.cpu_count() or 1
    if n <= 2:  # cgroup quota hidden from the affinity mask
        n = 4
    return max(1, n // max(1, share))


def decode_file(path: str, max_bytes: int = 64 * 1024 * 1024) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    buf = np.empty(max_bytes, dtype=np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.bdvc_decode_file(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_bytes,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"decode failed ({rc}) for {path}")
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_resize_crop_batch(
    paths: Sequence[str],
    short_side: int,
    out_h: int,
    out_w: int,
    crops: Optional[Sequence[Tuple[int, int]]] = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode -> resize(short side) -> crop each path into (N, out_h, out_w, 3).

    crops: per-image (x, y) offsets after resize; None -> center crop."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if crops is None:
        cx = cy = None
        cx_ptr = cy_ptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_int))
    else:
        cx = np.ascontiguousarray([c[0] for c in crops], dtype=np.int32)
        cy = np.ascontiguousarray([c[1] for c in crops], dtype=np.int32)
        cx_ptr = cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        cy_ptr = cy.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_decode_resize_crop_batch(
        c_paths,
        n,
        short_side,
        out_h,
        out_w,
        cx_ptr,
        cy_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"decode failed for {paths[rc - 1]}")
    return out


def decode_resize2_crop_batch(
    paths: Sequence[str],
    resize_dims: np.ndarray,
    out_h: int,
    out_w: int,
    crops: Sequence[Tuple[int, int]],
    num_threads: int = 0,
) -> np.ndarray:
    """Per-image anisotropic resize + crop: decode each path, resize to
    resize_dims[i] = (w, h) with independent x/y factors, crop out_h x out_w
    at crops[i]. Realizes crop-then-resize pipelines (MultiScaleCrop ->
    Resize) as one resize-then-crop with the exact crop-box distribution."""
    lib = _load()
    if lib is None or not hasattr(lib, "bdvc_decode_resize2_crop_batch"):
        raise RuntimeError("native decoder unavailable or too old")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    dims = np.ascontiguousarray(resize_dims, dtype=np.int32).reshape(n, 2)
    rw = np.ascontiguousarray(dims[:, 0])
    rh = np.ascontiguousarray(dims[:, 1])
    cx = np.ascontiguousarray([c[0] for c in crops], dtype=np.int32)
    cy = np.ascontiguousarray([c[1] for c in crops], dtype=np.int32)
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_decode_resize2_crop_batch(
        c_paths,
        n,
        rw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_h,
        out_w,
        cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cy.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"decode failed for {paths[rc - 1]}")
    return out


def has_yuv420() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "bdvc_decode_yuv420_batch")


def has_yuv420_full() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "bdvc_decode_yuv420_full_batch")


def decode_yuv420_full_batch(
    paths: Sequence[str],
    resize_dims: np.ndarray,
    pad_w: int,
    pad_h: int,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full-frame YUV420 EVAL wire (native bdvc_decode_yuv420_full_batch):
    each frame short-side-resized to its (rw, rh) target and pasted at the
    origin of fixed padded slots — y (N, pad_h, pad_w) uint8 luma, c
    (N, pad_h//2, pad_w//2, 2) uint8 interleaved CbCr, zero padding. Device
    code slices eval crops out of these (ops/augment.eval_yuv_full_crops);
    any such crop is bit-identical to :func:`decode_yuv420_batch` at the
    same offsets, because the windowed resize computes output pixels
    position-independently. Replaces the reference TenCrop host chain
    (libs/pipelines/five_crops.py + test pipelines) with a ship-once wire:
    ~131 KB/frame instead of 5 overlapping RGB crops (~752 KB)."""
    lib = _load()
    if lib is None or not hasattr(lib, "bdvc_decode_yuv420_full_batch"):
        raise RuntimeError("native decoder unavailable or too old")
    if pad_w % 2 or pad_h % 2:
        raise ValueError(f"pad dims must be even, got {(pad_w, pad_h)}")
    n = len(paths)
    dims = np.ascontiguousarray(resize_dims, dtype=np.int32).reshape(n, 2)
    if (dims[:, 0] > pad_w).any() or (dims[:, 1] > pad_h).any():
        raise ValueError("resize dims exceed pad dims")
    out_y = np.empty((n, pad_h, pad_w), dtype=np.uint8)
    out_c = np.empty((n, pad_h // 2, pad_w // 2, 2), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rw = np.ascontiguousarray(dims[:, 0])
    rh = np.ascontiguousarray(dims[:, 1])
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_decode_yuv420_full_batch(
        c_paths,
        n,
        rw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        pad_w,
        pad_h,
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"decode failed for {paths[rc - 1]}")
    return out_y, out_c


def decode_yuv420_batch(
    paths: Sequence[str],
    resize_dims: np.ndarray,
    out_size: int,
    crops: Sequence[Tuple[int, int]],
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """YUV420 wire-format variant of :func:`decode_resize2_crop_batch`:
    returns (y, c) with y (N, out, out) uint8 luma crops and c
    (N, out//2, out//2, 2) uint8 interleaved CbCr at the JPEG's stored 2x2
    subsampling. Chroma upsample + YCbCr->RGB run on-device
    (ops/augment.yuv420_to_rgb), halving host->device wire bytes — the
    measured e2e bottleneck on tunneled TPU hosts. Geometry (per-image
    anisotropic resize + crop) matches the RGB kernel; chroma planes use the
    same grid at half resolution."""
    lib = _load()
    if lib is None or not hasattr(lib, "bdvc_decode_yuv420_batch"):
        raise RuntimeError("native decoder unavailable or too old")
    if out_size % 2 != 0:
        raise ValueError(f"out_size must be even, got {out_size}")
    n = len(paths)
    half = out_size // 2
    out_y = np.empty((n, out_size, out_size), dtype=np.uint8)
    out_c = np.empty((n, half, half, 2), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    dims = np.ascontiguousarray(resize_dims, dtype=np.int32).reshape(n, 2)
    rw = np.ascontiguousarray(dims[:, 0])
    rh = np.ascontiguousarray(dims[:, 1])
    cx = np.ascontiguousarray([c[0] for c in crops], dtype=np.int32)
    cy = np.ascontiguousarray([c[1] for c in crops], dtype=np.int32)
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_decode_yuv420_batch(
        c_paths,
        n,
        rw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_size,
        cx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cy.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"decode failed for {paths[rc - 1]}")
    return out_y, out_c


def has_fetch_planes() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "bdvc_fetch_planes_batch")


def fetch_planes_batch(
    paths: Sequence[str], pad_w: int, pad_h: int, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stored-plane wire format: raw YCbCr 420 planes at STORED resolution,
    tight-packed into fixed pads — the windowed bilinear resize runs on
    device as exact integer matmuls (ops/augment.resize_planes_bilinear), so
    warm host work per frame is one plane-cache lookup + memcpy.

    Returns (y, c, dims): y (N, pad_h, pad_w) uint8, c (N, pad_h/2, pad_w/2,
    2) uint8 interleaved CbCr, dims (N, 2) int32 stored (w, h) — (0, 0)
    flags a frame the caller must host-resize instead (non-420 JPEG,
    unreadable, or larger than the pad)."""
    lib = _load()
    if lib is None or not hasattr(lib, "bdvc_fetch_planes_batch"):
        raise RuntimeError("native decoder unavailable or too old")
    if pad_w % 2 != 0 or pad_h % 2 != 0:
        raise ValueError(f"pad dims must be even, got {(pad_w, pad_h)}")
    n = len(paths)
    out_y = np.empty((n, pad_h, pad_w), dtype=np.uint8)
    out_c = np.empty((n, pad_h // 2, pad_w // 2, 2), dtype=np.uint8)
    dims = np.empty((n, 2), dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_fetch_planes_batch(
        c_paths,
        n,
        pad_w,
        pad_h,
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if rc != 0:
        raise ValueError(f"fetch_planes_batch: bad pad dims {(pad_w, pad_h)}")
    return out_y, out_c, dims


def probe_dims_batch(paths: Sequence[str], num_threads: int = 0) -> np.ndarray:
    """JPEG header-only (w, h) probe: returns an (N, 2) int32 array of
    original dimensions without decoding pixel data."""
    lib = _load()
    if lib is None or not hasattr(lib, "bdvc_probe_dims_batch"):
        raise RuntimeError("native decoder unavailable or too old")
    n = len(paths)
    widths = np.empty(n, dtype=np.int32)
    heights = np.empty(n, dtype=np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_probe_dims_batch(
        c_paths,
        n,
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if rc != 0:
        raise IOError(f"probe failed for {paths[rc - 1]}")
    return np.stack([widths, heights], axis=1)


def decode_tencrop_batch(
    paths: Sequence[str], short_side: int, crop: int, num_threads: int = 0
) -> np.ndarray:
    """Decode each path once and emit the 5 fixed TenCrop positions:
    (N, 5, crop, crop, 3) uint8 (flips are added on-device)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.empty((n, 5, crop, crop, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = default_threads()
    rc = lib.bdvc_decode_tencrop_batch(
        c_paths, n, short_side, crop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
    )
    if rc != 0:
        raise IOError(f"decode failed for {paths[rc - 1]}")
    return out


def decode_cache_stats() -> Optional[dict]:
    """Decoded-plane cache counters: ``{'hits', 'misses', 'bytes',
    'entries'}`` (None when the native library predates the cache). Hit rate
    telemetry for the fast input path — the cache turns epoch 2+ of a task
    into windowed-resize-only work (native/decoder.cpp PlaneCache)."""
    lib = _load()
    if lib is None or not hasattr(lib, "bdvc_cache_stats"):
        return None
    vals = [ctypes.c_long(0) for _ in range(4)]
    lib.bdvc_cache_stats(*[ctypes.byref(v) for v in vals])
    return dict(zip(("hits", "misses", "bytes", "entries"), (v.value for v in vals)))


def decode_cache_clear() -> None:
    lib = _load()
    if lib is not None and hasattr(lib, "bdvc_cache_clear"):
        lib.bdvc_cache_clear()


def decode_cache_set_budget_mb(mb: int) -> None:
    """Override the decoded-plane cache budget at runtime (<=0 disables and
    flushes). Startup default comes from BDVC_DECODE_CACHE_MB (512)."""
    lib = _load()
    if lib is not None and hasattr(lib, "bdvc_cache_set_budget_mb"):
        lib.bdvc_cache_set_budget_mb(int(mb))
