"""Device-side (XLA) whole-clip-consistent RandAugment.

Branchless rebuild of the reference's PIL RandAugment
(libs/pipelines/rand_augment.py:19-264 — host oracle in
bdvcil_tpu/data/rand_augment.py) for the fast uint8 input path: the 15
FixMatch ops are jnp programs selected per clip with ``lax.switch``, so a
whole batch of clips augments in one fused XLA region on the VPU with zero
host work. Per-clip parameters (op choices, magnitude sign, cutout location)
are drawn from a jax PRNG key — matching the reference's
sample-once-per-clip semantics (rand_augment.py:239-244).

PIL-parity notes (validated against PIL in tests/test_rand_augment_dev.py):
  * geometric ops use PIL's inverse-mapping NEAREST convention
    (src = M @ (dst + 0.5), floor) with the mean-pixel fill color
  * Equalize/AutoContrast reproduce PIL's integer LUT construction
  * enhancement ops (Color/Contrast/Brightness/Sharpness) blend with the
    PIL degenerate image; float rounding may differ by <=1 LSB
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

FILL_COLOR = (124, 116, 104)  # reference rand_augment.py:16

# (name, minval, maxval) — FixMatch table (reference rand_augment.py:200-216)
OP_TABLE = (
    ("Identity", 0.0, 1.0),
    ("AutoContrast", 0.0, 1.0),
    ("Equalize", 0.0, 1.0),
    ("Rotate", 0.0, 30.0),
    ("Solarize", 0.0, 256.0),
    ("Color", 0.05, 0.95),
    ("Contrast", 0.05, 0.95),
    ("Brightness", 0.05, 0.95),
    ("Sharpness", 0.05, 0.95),
    ("ShearX", 0.0, 0.3),
    ("TranslateX", 0.0, 0.3),
    ("TranslateY", 0.0, 0.3),
    ("Posterize", 4.0, 8.0),
    ("ShearY", 0.0, 0.3),
    ("CutoutAbs", 0.0, 112.0),
)
NUM_OPS = len(OP_TABLE)


def op_magnitudes(m: int) -> Tuple[float, ...]:
    """val = (m/30) * (max - min) + min per op (rand_augment.py:247)."""
    return tuple((float(m) / 30.0) * (mx - mn) + mn for _, mn, mx in OP_TABLE)


# -- helpers ----------------------------------------------------------------


def _lut_apply(img: jax.Array, lut: jax.Array) -> jax.Array:
    """img (..., C) uint8, lut (C, 256) or (256,).

    Gather-free: ``lut[img]`` is a per-element DMA gather that runs at
    ~115M elem/s on TPU (profiled at 79 ms per 6.4M-pixel application —
    PERF_NOTES "Device RandAugment"); the compare-select form fuses into
    one VPU reduction over the 256 axis instead."""
    levels = jnp.arange(256, dtype=img.dtype)

    def apply1(channel, lut1):
        onehot = channel[..., None] == levels  # (..., 256), fused into the max
        # exactly one level matches, so a u8 max-reduce selects lut1[channel]
        # without the u32 accumulator a sum-reduce would widen to
        return jnp.max(jnp.where(onehot, lut1.astype(jnp.uint8)[None, :], 0), axis=-1)

    if lut.ndim == 1:
        return apply1(img, lut)
    return jnp.stack(
        [apply1(img[..., c], lut[c]) for c in range(img.shape[-1])], axis=-1
    )


def _per_frame(fn):
    """Lift a (H, W, C) op to (T, H, W, C) — PIL ops run per frame."""

    def wrapped(imgs, *args):
        return jax.vmap(lambda im: fn(im, *args))(imgs)

    return wrapped


def _gray_l(img: jax.Array) -> jax.Array:
    """PIL 'L' conversion: (R*19595 + G*38470 + B*7471 + 0x8000) >> 16."""
    r = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    b = img[..., 2].astype(jnp.int32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(jnp.uint8)


def _blend(degenerate: jax.Array, img: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL Image.blend(degenerate, img, factor) with clipping."""
    d = degenerate.astype(jnp.float32)
    out = d + factor * (img.astype(jnp.float32) - d)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def _affine_nearest(img: jax.Array, matrix, fill=FILL_COLOR) -> jax.Array:
    """PIL Image.transform(AFFINE, matrix) with NEAREST resampling.

    For output pixel (x, y): src = (a(x+.5)+b(y+.5)+c, d(x+.5)+e(y+.5)+f),
    sampled at floor(src); out-of-bounds -> fill.
    """
    h, w = img.shape[0], img.shape[1]
    a, b, c, d, e, f = matrix
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    src_x = a * xs[None, :] + b * ys[:, None] + c
    src_y = d * xs[None, :] + e * ys[:, None] + f
    ix = jnp.floor(src_x).astype(jnp.int32)
    iy = jnp.floor(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    gathered = img[iyc, ixc]
    fill_arr = jnp.asarray(fill, dtype=img.dtype)
    return jnp.where(valid[..., None], gathered, fill_arr)


# -- the 15 ops (each: (imgs (T,H,W,C) u8, val, sign, cutout_loc) -> u8) ----


def _op_identity(imgs, val, sign, loc):
    return imgs


def _op_autocontrast(imgs, val, sign, loc):
    def one(img):
        flat = img.reshape(-1, img.shape[-1])
        lo = flat.min(axis=0).astype(jnp.float32)  # (C,)
        hi = flat.max(axis=0).astype(jnp.float32)
        scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
        # PIL builds lut[ix] = int(ix*scale + offset) and gathers — but the
        # lut IS that formula, so evaluate it per pixel instead of paying a
        # 256-level LUT application (bit-identical: same f32 expression the
        # LUT entries were built from, truncation via int cast after clip;
        # measured 24.7 -> 13.4 ms/batch on v5e, tools/bench_lut.py)
        val_px = jnp.clip((img.astype(jnp.float32) - lo) * scale, 0, 255).astype(jnp.int32)
        return jnp.where(hi > lo, val_px, img.astype(jnp.int32)).astype(jnp.uint8)

    return jax.vmap(one)(imgs)


def _op_equalize(imgs, val, sign, loc):
    def one_channel(channel):
        flat = channel.reshape(-1)
        # scatter-free histogram: the .at[flat].add(1) form serializes on the
        # TPU scatter path (~56 ms/frame-channel profiled); the compare form
        # fuses into one VPU reduction over the pixel axis
        h = jnp.sum(
            (flat[:, None] == jnp.arange(256, dtype=flat.dtype)[None, :]).astype(jnp.int32),
            axis=0,
        )
        nonzero = h > 0
        # index of the last nonzero bin
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        last_count = h[last_idx]
        n_nonzero = jnp.sum(nonzero)
        step = (jnp.sum(h) - last_count) // 255
        csum_ex = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(h)[:-1]])
        lut = jnp.clip((step // 2 + csum_ex) // jnp.maximum(step, 1), 0, 255)
        identity_lut = jnp.arange(256, dtype=jnp.int32)
        use_identity = (n_nonzero <= 1) | (step == 0)
        lut = jnp.where(use_identity, identity_lut, lut).astype(jnp.uint8)
        return _lut_apply(channel, lut)

    def one(img):
        return jnp.stack([one_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)

    return jax.vmap(one)(imgs)


# -- affine matrix builders (single source of truth: both the per-op
# functions and the batch path's matrix select use these) ------------------


def _rotate_matrix(val, sign, h: int, w: int):
    # PIL rotate(angle) negates the angle before building the inverse-map
    # affine matrix around the image center
    angle = -jnp.where(sign, -val, val) * (jnp.pi / 180.0)
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    return (cos, sin, cx - cx * cos - cy * sin, -sin, cos, cy + cx * sin - cy * cos)


def _shear_x_matrix(val, sign, h: int, w: int):
    v = jnp.where(sign, -val, val)
    return (1.0, v, 0.0, 0.0, 1.0, 0.0)


def _shear_y_matrix(val, sign, h: int, w: int):
    v = jnp.where(sign, -val, val)
    return (1.0, 0.0, 0.0, v, 1.0, 0.0)


def _translate_x_matrix(val, sign, h: int, w: int):
    v = jnp.where(sign, -val, val) * w
    return (1.0, 0.0, v, 0.0, 1.0, 0.0)


def _translate_y_matrix(val, sign, h: int, w: int):
    v = jnp.where(sign, -val, val) * h
    return (1.0, 0.0, 0.0, 0.0, 1.0, v)


def _op_rotate(imgs, val, sign, loc):
    h, w = imgs.shape[1], imgs.shape[2]
    return _per_frame(_affine_nearest)(imgs, _rotate_matrix(val, sign, h, w))


def _op_solarize(imgs, val, sign, loc):
    thr = val.astype(jnp.int32) if hasattr(val, "astype") else jnp.int32(val)
    x = imgs.astype(jnp.int32)
    return jnp.where(x < thr, x, 255 - x).astype(jnp.uint8)


def _op_color(imgs, val, sign, loc):
    def one(img):
        gray = _gray_l(img)[..., None].astype(jnp.float32)
        return _blend(jnp.broadcast_to(gray, img.shape).astype(jnp.uint8), img, val)

    return jax.vmap(one)(imgs)


def _op_contrast(imgs, val, sign, loc):
    def one(img):
        gray = _gray_l(img)
        mean = jnp.floor(gray.astype(jnp.float32).mean() + 0.5)
        degenerate = jnp.full_like(img, 0).astype(jnp.float32) + mean
        return _blend(degenerate.astype(jnp.uint8), img, val)

    return jax.vmap(one)(imgs)


def _op_brightness(imgs, val, sign, loc):
    def one(img):
        return _blend(jnp.zeros_like(img), img, val)

    return jax.vmap(one)(imgs)


_SMOOTH_KERNEL = jnp.asarray(
    [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]], jnp.float32
) / 13.0


def _op_sharpness(imgs, val, sign, loc):
    def one(img):
        x = img.astype(jnp.float32)
        smoothed = jax.lax.conv_general_dilated(
            x.transpose(2, 0, 1)[:, None],  # (C, 1, H, W)
            _SMOOTH_KERNEL[None, None],
            window_strides=(1, 1),
            padding="SAME",
        )[:, 0].transpose(1, 2, 0)
        smoothed = jnp.clip(jnp.round(smoothed), 0, 255)
        # PIL's filter keeps the 1-pixel border unchanged
        h, w = img.shape[0], img.shape[1]
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        interior = (ys > 0) & (ys < h - 1) & (xs > 0) & (xs < w - 1)
        degenerate = jnp.where(interior[..., None], smoothed, x)
        return _blend(degenerate.astype(jnp.uint8), img, val)

    return jax.vmap(one)(imgs)


def _shear_x(imgs, val, sign, loc):
    h, w = imgs.shape[1], imgs.shape[2]
    return _per_frame(_affine_nearest)(imgs, _shear_x_matrix(val, sign, h, w))


def _shear_y(imgs, val, sign, loc):
    h, w = imgs.shape[1], imgs.shape[2]
    return _per_frame(_affine_nearest)(imgs, _shear_y_matrix(val, sign, h, w))


def _translate_x(imgs, val, sign, loc):
    h, w = imgs.shape[1], imgs.shape[2]
    return _per_frame(_affine_nearest)(imgs, _translate_x_matrix(val, sign, h, w))


def _translate_y(imgs, val, sign, loc):
    h, w = imgs.shape[1], imgs.shape[2]
    return _per_frame(_affine_nearest)(imgs, _translate_y_matrix(val, sign, h, w))


def _op_posterize(imgs, val, sign, loc):
    bits = jnp.maximum(val.astype(jnp.int32) if hasattr(val, "astype") else jnp.int32(val), 1)
    mask = (0xFF << (8 - bits)) & 0xFF
    return (imgs.astype(jnp.int32) & mask).astype(jnp.uint8)


def _op_cutout(imgs, val, sign, loc):
    h, w = imgs.shape[1], imgs.shape[2]
    x0f, y0f = loc
    x0 = jnp.maximum(0.0, x0f - val / 2.0).astype(jnp.int32)
    y0 = jnp.maximum(0.0, y0f - val / 2.0).astype(jnp.int32)
    x1 = jnp.minimum(w, x0 + val.astype(jnp.int32))
    y1 = jnp.minimum(h, y0 + val.astype(jnp.int32))
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    # PIL ImageDraw.rectangle fills the inclusive box [x0, x1] x [y0, y1]
    in_box = (ys >= y0) & (ys <= y1) & (xs >= x0) & (xs <= x1)
    fill = jnp.asarray(FILL_COLOR, imgs.dtype)
    return jnp.where(in_box[None, :, :, None], fill, imgs)


# indices into _OPS / OP_TABLE of the affine (geometric) ops
_EQUALIZE_ID = 2
_GEO_ROTATE, _GEO_SHEARX, _GEO_TRANSX, _GEO_TRANSY, _GEO_SHEARY = 3, 9, 10, 11, 13
_GEO_IDS = (_GEO_ROTATE, _GEO_SHEARX, _GEO_TRANSX, _GEO_TRANSY, _GEO_SHEARY)

_GEO_MATRIX_FNS = (
    (_GEO_ROTATE, _rotate_matrix),
    (_GEO_SHEARX, _shear_x_matrix),
    (_GEO_SHEARY, _shear_y_matrix),
    (_GEO_TRANSX, _translate_x_matrix),
    (_GEO_TRANSY, _translate_y_matrix),
)

_OPS = (
    _op_identity,
    _op_autocontrast,
    _op_equalize,
    _op_rotate,
    _op_solarize,
    _op_color,
    _op_contrast,
    _op_brightness,
    _op_sharpness,
    _shear_x,
    _translate_x,
    _translate_y,
    _op_posterize,
    _shear_y,
    _op_cutout,
)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def rand_augment_clip(key: jax.Array, imgs: jax.Array, n: int = 2, m: int = 10) -> jax.Array:
    """Apply n randomly-chosen ops to one clip (T, H, W, C) uint8.

    Op choice, magnitude sign, and cutout location are drawn once per clip
    and shared by all frames (reference rand_augment.py:238-244)."""
    h, w = imgs.shape[1], imgs.shape[2]
    k_ops, k_sign, k_x, k_y = jax.random.split(key, 4)
    op_indices = jax.random.randint(k_ops, (n,), 0, NUM_OPS)
    flip_sign = jax.random.uniform(k_sign) > 0.5
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=float(w))
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=float(h))

    vals = jnp.asarray(op_magnitudes(m), jnp.float32)

    def apply_one(imgs, op_idx):
        branches = [
            (lambda op=op, v=vals[i]: (lambda im: op(im, v, flip_sign, (x0, y0))))()
            for i, op in enumerate(_OPS)
        ]
        return jax.lax.switch(op_idx, branches, imgs)

    for i in range(n):
        imgs = apply_one(imgs, op_indices[i])
    return imgs


def _affine_matrix_for_op(op_idx, sign, vals, h: int, w: int):
    """Per-clip PIL inverse-map affine matrix (a,b,c,d,e,f) for the chosen
    op — identity when the op is not geometric. Uses the SAME matrix
    builders as the per-op functions (single source of truth)."""
    mat = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], jnp.float32)
    for gid, builder in _GEO_MATRIX_FNS:
        terms = builder(jnp.float32(vals[gid]), sign, h, w)
        cand = jnp.stack([jnp.asarray(x, jnp.float32) for x in terms])
        mat = jnp.where(op_idx == gid, cand, mat)
    return mat


def _affine_nearest_clip(imgs: jax.Array, matrix: jax.Array, fill=FILL_COLOR) -> jax.Array:
    """_affine_nearest over a whole clip (T,H,W,C) with ONE index computation
    and one gather of (H·W) rows of T·C bytes — the slice-per-pixel DMA
    gather was the device RandAugment bottleneck (PERF_NOTES)."""
    t, h, w, c = imgs.shape
    a, b, cc, d, e, f = (matrix[i] for i in range(6))
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    src_x = a * xs[None, :] + b * ys[:, None] + cc
    src_y = d * xs[None, :] + e * ys[:, None] + f
    ix = jnp.floor(src_x).astype(jnp.int32)
    iy = jnp.floor(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    flat_idx = (jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)).reshape(-1)
    rows = imgs.transpose(1, 2, 0, 3).reshape(h * w, t * c)[flat_idx]  # (H·W, T·C)
    out = rows.reshape(h, w, t, c).transpose(2, 0, 1, 3)
    fill_arr = jnp.asarray(fill, dtype=imgs.dtype)
    return jnp.where(valid[None, :, :, None], out, fill_arr)


def _bucket_capacity(b: int) -> int:
    """Static capacity of the expensive-op bucket: ~B/4, floor 2. With ops
    drawn uniformly (p=1/15 per round) the bucket overflows with probability
    ~1e-3 at B=16 — the full-batch fallback branch then runs (still exact)."""
    return b if b <= 2 else max(2, (b + 3) // 4)


def _apply_selected_rows(imgs: jax.Array, sel: jax.Array, fn, k: int) -> jax.Array:
    """Run ``fn`` (a whole-batch image op) on only the rows where ``sel``.

    TPU cost shaping: an expensive op (equalize: ~44 ms/batch of compare-
    reduce histograms + LUT selects) is selected by ~1 clip per round, but
    the branchless batch form pays it for all B clips. Here the selected
    rows are compacted to the front with a tiny argsort over B bools, the
    first ``k`` rows are gathered (static shape), ``fn`` runs on that
    sub-batch, and results scatter back. When more than ``k`` rows are
    selected, a ``lax.cond`` falls back to the full-batch application —
    both branches are compiled once, only one executes per step, so the
    common case costs fn(k rows) + two (k,T,H,W,C) copies. Output rows
    where ``sel`` is False are unspecified (callers mask with ``sel``)."""
    if k >= imgs.shape[0]:
        return fn(imgs)
    order = jnp.argsort(~sel)  # stable: selected rows first, in index order
    idx = order[:k]

    def small(ims):
        return ims.at[idx].set(fn(jnp.take(ims, idx, axis=0)))

    return jax.lax.cond(jnp.sum(sel) <= k, small, fn, imgs)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def rand_augment_batch(keys: jax.Array, imgs: jax.Array, n: int = 2, m: int = 10) -> jax.Array:
    """Batch RandAugment: keys (B, 2) u32, imgs (B, T, H, W, C) u8.

    Bit-identical to ``vmap(rand_augment_clip)`` (same per-clip key splits
    and op programs — asserted by tests/test_rand_augment_dev.py) but
    restructured for TPU. Two pathologies in the naive vmap(switch) form
    (measured 1.38 s/batch on v5e):

      * a vmapped ``lax.switch`` computes every branch for every clip, so
        all 5 affine ops ran their per-pixel DMA gathers each round;
      * each affine gathered 3-byte pixels with per-frame indices — 6.4M
        tiny descriptors per op (~115M elem/s on the TPU gather path).

    Here each round SELECTS the per-clip affine matrix (6 scalars — the
    op identity only changes the matrix) and runs ONE shared clip-level
    gather of (H·W) rows of T·C bytes; the 9 photometric ops are
    elementwise/LUT and run batch-wide with a masked select. One gather
    per round instead of five, with 24x larger DMA rows."""
    h, w = imgs.shape[2], imgs.shape[3]

    def clip_params(key):
        k_ops, k_sign, k_x, k_y = jax.random.split(key, 4)
        op_indices = jax.random.randint(k_ops, (n,), 0, NUM_OPS)
        flip_sign = jax.random.uniform(k_sign) > 0.5
        x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=float(w))
        y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=float(h))
        return op_indices, flip_sign, x0, y0

    op_indices, flip_sign, x0, y0 = jax.vmap(clip_params)(keys)  # (B,n) (B,) (B,) (B,)
    vals = op_magnitudes(m)

    for r in range(n):
        idx = op_indices[:, r]  # (B,)
        is_geo = jnp.isin(idx, jnp.asarray(_GEO_IDS))

        # geometric: one shared gather with the selected per-clip matrix
        mats = jax.vmap(lambda i, s: _affine_matrix_for_op(i, s, vals, h, w))(idx, flip_sign)
        geo_out = jax.vmap(_affine_nearest_clip)(imgs, mats)

        # photometric: each op batch-wide, masked select (cheap: LUT/elementwise)
        out = jnp.where(is_geo[:, None, None, None, None], geo_out, imgs)
        for i, op in enumerate(_OPS):
            if i == 0 or i in _GEO_IDS:
                continue
            sel = idx == i
            if i == _EQUALIZE_ID:
                # equalize is ~44 ms/batch of histograms + LUT selects but is
                # selected by ~1 clip/round: run it on a compacted sub-batch
                # (full-batch lax.cond fallback keeps exactness on overflow).
                # equalize ignores val/sign/loc, so the sub-batch fn is closed
                # over dummies
                fn = jax.vmap(
                    lambda im: _op_equalize(
                        im, jnp.float32(0), jnp.bool_(False), (jnp.float32(0), jnp.float32(0))
                    )
                )
                applied = _apply_selected_rows(
                    imgs, sel, fn, _bucket_capacity(imgs.shape[0])
                )
            else:
                applied = jax.vmap(
                    lambda im, s, x, y, op=op, v=jnp.float32(vals[i]): op(im, v, s, (x, y))
                )(imgs, flip_sign, x0, y0)
            out = jnp.where(sel[:, None, None, None, None], applied, out)
        imgs = out
    return imgs
