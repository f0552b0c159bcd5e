"""Fused on-device augmentation ops.

The reference does all of this per-sample on CPU dataloader workers
(SURVEY.md §3.3 hot loop); here the batched versions run under jit on the
TPU so the VPU does the elementwise math and host workers only decode JPEGs.

  * ``normalize_batch``   — uint8 -> normalized float in one fused expression
  * ``background_blend``  — the headline BGMix blend, imgs*(1-a) + bg*a
                            (reference comix_loader.py:138-145)
  * ``tubemix``           — tube-CutMix across the batch with area-based label
                            mixing (reference icarl_video_mix.py:48-81)
  * ``temporal_median``   — temporal-median-filter background extraction on
                            device (reference comix_loader.py:148-164)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def normalize_batch(
    imgs: jax.Array,
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53),
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375),
    dtype=jnp.float32,
) -> jax.Array:
    """(..., C) uint8/float -> normalized ``dtype``. Fused by XLA with the
    consumer conv, so the uint8 batch is what crosses PCIe/ICI."""
    mean_arr = jnp.asarray(mean, dtype=jnp.float32)
    inv_std = 1.0 / jnp.asarray(std, dtype=jnp.float32)
    return ((imgs.astype(jnp.float32) - mean_arr) * inv_std).astype(dtype)


def fancy_upsample2x(plane: jax.Array) -> jax.Array:
    """2x2 chroma upsample with libjpeg's "fancy" (triangular) filter
    (jdsample.c h2v2_fancy_upsample): each output pixel is the 9/3/3/1-
    weighted blend of the 4 nearest chroma samples, edges replicated,
    rounding +8 on even / +7 on odd output columns like libjpeg.

    plane: (..., H, W) any integer/uint dtype -> (..., 2H, 2W) uint8.
    Pure reshapes + adds, fuses into the surrounding elementwise graph.
    """
    p = plane.astype(jnp.int32)
    left = jnp.concatenate([p[..., :, :1], p[..., :, :-1]], axis=-1)
    right = jnp.concatenate([p[..., :, 1:], p[..., :, -1:]], axis=-1)
    he = 3 * p + left  # contributes to even output columns
    ho = 3 * p + right  # odd output columns
    up = jnp.concatenate([p[..., :1, :], p[..., :-1, :]], axis=-2)
    dn = jnp.concatenate([p[..., 1:, :], p[..., -1:, :]], axis=-2)
    ue = 3 * up + jnp.concatenate([up[..., :, :1], up[..., :, :-1]], axis=-1)
    uo = 3 * up + jnp.concatenate([up[..., :, 1:], up[..., :, -1:]], axis=-1)
    de = 3 * dn + jnp.concatenate([dn[..., :, :1], dn[..., :, :-1]], axis=-1)
    do = 3 * dn + jnp.concatenate([dn[..., :, 1:], dn[..., :, -1:]], axis=-1)
    # four output quadrants per chroma sample: (row even/odd) x (col even/odd)
    ree = (3 * he + ue + 8) >> 4
    reo = (3 * ho + uo + 7) >> 4
    roe = (3 * he + de + 8) >> 4
    roo = (3 * ho + do + 7) >> 4
    rows_e = jnp.stack([ree, reo], axis=-1).reshape(*p.shape[:-1], p.shape[-1] * 2)
    rows_o = jnp.stack([roe, roo], axis=-1).reshape(*p.shape[:-1], p.shape[-1] * 2)
    out = jnp.stack([rows_e, rows_o], axis=-2).reshape(
        *p.shape[:-2], p.shape[-2] * 2, p.shape[-1] * 2
    )
    return out.astype(jnp.uint8)


def yuv420_to_rgb(y: jax.Array, c: jax.Array) -> jax.Array:
    """Reconstruct RGB uint8 from the YUV420 wire format
    (native.decode_yuv420_batch): y (..., H, W) uint8 luma, c
    (..., H/2, W/2, 2) uint8 interleaved CbCr. Chroma is fancy-upsampled
    (:func:`fancy_upsample2x`) then converted with libjpeg's fixed-point
    YCbCr->RGB coefficients (jdcolor.c), so the device output matches what
    the host RGB decode path would have produced up to the resize-order
    difference of the two wire formats."""
    cb = fancy_upsample2x(c[..., 0]).astype(jnp.int32) - 128
    cr = fancy_upsample2x(c[..., 1]).astype(jnp.int32) - 128
    yi = y.astype(jnp.int32)
    r = yi + ((91881 * cr + 32768) >> 16)  # FIX(1.40200)
    g = yi + ((-22554 * cb - 46802 * cr + 32768) >> 16)  # FIX(0.34414), FIX(0.71414)
    b = yi + ((116130 * cb + 32768) >> 16)  # FIX(1.77200)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0, 255).astype(jnp.uint8)


def resize_plane_bilinear_taps(planes: jax.Array, taps: jax.Array, out: int) -> jax.Array:
    """Windowed bilinear resize of stored-resolution planes on the MXU,
    bit-identical to the host C++ fixed-point path (native/decoder.cpp
    bilinear_resize_window_t): two-tap separable filter with integer weights
    in [0, 256], single rounding ``(acc + 32768) >> 16``.

    planes: (B, T, Hp, Wp) or (B, T, Hp, Wp, C) uint8, stored planes padded
      to (Hp, Wp) (padding rows/cols are never indexed by valid taps).
    taps: (B, 6, out) int32 — rows (x0, x1, xw, y0, y1, yw) from
      data/device_pipeline.plane_resize_taps; one geometry per batch element
      (shared by its T frames, exactly like the whole-clip host plan).

    Exactness: pixels (<=255) and weights (<=256) are bf16-exact, the MXU
    accumulates in f32, and every intermediate is an integer < 2^24
    (255*256*256 = 16,711,680), so both matmul passes are exact integer
    arithmetic; the vertical pass splits the 16-bit intermediate into hi/lo
    bytes so its operands stay bf16-exact. Cost at (16, 8, 240, 320)->224 is
    ~0.1 ms/batch — the host's ~25-100 ms/batch of windowed resize moves to
    idle MXU cycles (PERF_NOTES "Round 3").
    """
    has_c = planes.ndim == 5
    if not has_c:
        planes = planes[..., None]
    b, t, hp, wp, ch = planes.shape
    x0, x1, xw = taps[:, 0], taps[:, 1], taps[:, 2]
    y0, y1, yw = taps[:, 3], taps[:, 4], taps[:, 5]

    # bf16 feeds the MXU on TPU (pixels <= 255 and weights <= 256 are
    # bf16-exact); other backends lack the bf16xbf16->f32 dot, and plain f32
    # is equally exact there
    mm = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    j = jnp.arange(wp, dtype=jnp.int32)[None, :, None]  # (1, Wp, 1)
    w1 = xw.astype(jnp.float32)[:, None, :]  # (B, 1, out)
    rx = ((256.0 - w1) * (j == x0[:, None, :]) + w1 * (j == x1[:, None, :])).astype(
        mm
    )  # (B, Wp, out); x0==x1 edge taps sum to 256 via the add
    tmp = jnp.einsum(
        "bthjc,bjx->bthxc",
        planes.astype(mm),
        rx,
        preferred_element_type=jnp.float32,
    )  # integer-valued f32 in [0, 65280] — the host's uint16 value*256 rows
    tmp = tmp.astype(jnp.int32)

    i = jnp.arange(hp, dtype=jnp.int32)[None, None, :]  # (1, 1, Hp)
    v1 = yw.astype(jnp.float32)[:, :, None]  # (B, out, 1)
    ry = ((256.0 - v1) * (i == y0[:, :, None]) + v1 * (i == y1[:, :, None])).astype(
        mm
    )  # (B, out, Hp)
    hi = (tmp >> 8).astype(mm)
    lo = (tmp & 255).astype(mm)
    rhi = jnp.einsum("bih,bthxc->btixc", ry, hi, preferred_element_type=jnp.float32)
    rlo = jnp.einsum("bih,bthxc->btixc", ry, lo, preferred_element_type=jnp.float32)
    acc = rhi.astype(jnp.int32) * 256 + rlo.astype(jnp.int32)
    res = ((acc + 32768) >> 16).astype(jnp.uint8)
    return res if has_c else res[..., 0]


def background_blend(imgs: jax.Array, bg: jax.Array, alpha, apply_mask=None) -> jax.Array:
    """Alpha-blend backgrounds over clips.

    Args:
      imgs: (B, M, H, W, C) normalized clip frames.
      bg:   (B, H, W, C) normalized background image per sample (broadcast
            over the M frame axis).
      alpha: scalar or (B,) blend strength.
      apply_mask: optional (B,) bool; samples with False pass through
            (implements the per-sample probability / randAug mutex branchlessly).
    """
    alpha = jnp.asarray(alpha, dtype=imgs.dtype)
    if alpha.ndim == 1:
        alpha = alpha[:, None, None, None, None]
    blended = imgs * (1.0 - alpha) + bg[:, None] * alpha
    if apply_mask is None:
        return blended
    m = apply_mask.reshape(-1, 1, 1, 1, 1).astype(imgs.dtype)
    return imgs * (1.0 - m) + blended * m


def rand_bbox(key: jax.Array, height: int, width: int, lam: jax.Array):
    """Random box with area ratio sqrt(1 - lam) per side
    (reference icarl_video_mix.py:67-81). Returns (x1, y1, x2, y2)."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_w = (width * cut_rat).astype(jnp.int32)
    cut_h = (height * cut_rat).astype(jnp.int32)
    kx, ky = jax.random.split(key)
    cx = jax.random.randint(kx, (), 0, width)
    cy = jax.random.randint(ky, (), 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    x2 = jnp.clip(cx + cut_w // 2, 0, width)
    y2 = jnp.clip(cy + cut_h // 2, 0, height)
    return x1, y1, x2, y2


def tubemix(
    key: jax.Array,
    imgs: jax.Array,
    targets: jax.Array,
    alpha: float,
    prob: float,
):
    """Tube-CutMix: swap one spatial box across the batch for all frames and
    mix one-hot targets by the true box area (reference icarl_video_mix.py:48-64).

    Args:
      imgs: (B, M, H, W, C); targets: (B, num_classes) one-hot/soft.
    Returns (mixed_imgs, mixed_targets); identity when the prob draw fails.
    """
    b, m, h, w, c = imgs.shape
    k_apply, k_perm, k_beta, k_box = jax.random.split(key, 4)

    apply = jax.random.uniform(k_apply) > 1.0 - prob
    perm = jax.random.permutation(k_perm, b)
    lam0 = jax.random.beta(k_beta, alpha, alpha)
    x1, y1, x2, y2 = rand_bbox(k_box, h, w, lam0)

    ys = jnp.arange(h)[None, None, :, None, None]
    xs = jnp.arange(w)[None, None, None, :, None]
    in_box = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)).astype(imgs.dtype)

    mixed = imgs * (1.0 - in_box) + imgs[perm] * in_box
    # true area after clipping (reference recomputes lam from the box)
    lam = 1.0 - ((x2 - x1) * (y2 - y1)).astype(targets.dtype) / (h * w)
    mixed_targets = targets * lam + targets[perm] * (1.0 - lam)

    imgs_out = jnp.where(apply, mixed, imgs)
    targets_out = jnp.where(apply, mixed_targets, targets)
    return imgs_out, targets_out


def fused_train_augment(
    imgs_u8: jax.Array,
    bg_u8: jax.Array,
    apply_bgmix: jax.Array,
    flip: jax.Array,
    alpha: float = 0.5,
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
    dtype=jnp.float32,
) -> jax.Array:
    """The fused device half of the fast input path.

    Host workers ship raw uint8 crops (4 bytes/pixel less than float32 over
    PCIe); one fused XLA region does normalize + whole-clip horizontal flip +
    background alpha-blend. Replaces the reference's per-sample CPU chain
    Normalize/Flip/_mix_background (SURVEY.md §3.3).

    Args:
      imgs_u8: (B, M, H, W, C) uint8 clip crops.
      bg_u8:   (B, H, W, C) uint8 background crops, or None to skip the
               blend entirely (empty-bg_files fast path: the graph never
               builds the bg branch, exactly equivalent to an all-False
               apply_bgmix mask).
      apply_bgmix: (B,) bool — blend mask (prob draw / randAug mutex, host-side).
      flip:    (B,) bool — whole-clip horizontal flip.
    """
    imgs = normalize_batch(imgs_u8, mean, std, jnp.float32)
    flipped = imgs[:, :, :, ::-1, :]
    imgs = jnp.where(flip[:, None, None, None, None], flipped, imgs)
    if bg_u8 is None:
        return imgs.astype(dtype)
    bg = normalize_batch(bg_u8, mean, std, jnp.float32)
    out = background_blend(imgs, bg, alpha, apply_mask=apply_bgmix)
    return out.astype(dtype)


def tencrop_expand(imgs: jax.Array) -> jax.Array:
    """(B, T, 5, h, w, C) five-crop frames -> (B, 10*T, h, w, C) TenCrop.

    The native decoder emits the 5 fixed positions per frame
    (native/decoder.cpp bdvc_decode_tencrop_batch); the horizontal flips are
    generated here on-device. Group ordering matches the reference TenCrop
    (data/transforms.py): [p0, p0_flip, p1, p1_flip, ...], each group holding
    its T frames consecutively so the head's per-segment consensus reshape
    lands on crop groups.
    """
    b, t = imgs.shape[0], imgs.shape[1]
    x = jnp.moveaxis(imgs, 2, 1)  # (B, 5, T, h, w, C)
    flipped = x[:, :, :, :, ::-1, :]
    both = jnp.stack([x, flipped], axis=2)  # (B, 5, 2, T, h, w, C)
    return both.reshape(b, 10 * t, *imgs.shape[3:])


def eval_yuv_full_crops(batch, crop: int = None) -> jax.Array:
    """Full-frame YUV420 eval wire -> uint8 RGB crops, on device.

    batch: {'imgs_y': (B, T, ph, pw) uint8 luma (short-side-resized frames
    pasted at the pad origin, native.decode_yuv420_full_batch),
    'imgs_c': (B, T, ph//2, pw//2, 2) uint8 CbCr, 'crop_yx_<px>': (B, K, 2)
    int32 (y, x) luma crop offsets}. K = 1 (CenterCrop) or 5 (TenCrop
    positions, five_crops.py order; flips added by tencrop_expand
    afterwards). The crop size rides in the offsets key's suffix — pytree
    keys are static under jit, so the wire is self-describing and no config
    threading is needed (``crop`` overrides it for direct calls).

    Each sliced crop is bit-identical to what the cropped YUV wire
    (native.decode_yuv420_batch) ships for the same offsets — the windowed
    resize computes output pixels position-independently — so this wire
    changes no pixel vs the shipping yuv420 eval semantics while shipping
    each frame ONCE instead of K overlapping crops (the reference's TenCrop
    host chain, libs/pipelines/five_crops.py + test pipeline cil.py:164).

    Returns (B, T, K, crop, crop, 3) uint8 RGB.
    """
    y, c = batch["imgs_y"], batch["imgs_c"]
    offs_key = next(k for k in batch if k.startswith("crop_yx"))
    offs = batch[offs_key]
    if crop is None:
        crop = int(offs_key.rsplit("_", 1)[1])
    half = crop // 2
    t = y.shape[1]

    def per_sample(y_s, c_s, off_s):
        def per_crop(off):
            oy, ox = off[0], off[1]
            yc = jax.lax.dynamic_slice(y_s, (0, oy, ox), (t, crop, crop))
            cc = jax.lax.dynamic_slice(
                c_s, (0, oy // 2, ox // 2, 0), (t, half, half, 2)
            )
            return yuv420_to_rgb(yc, cc)

        return jax.vmap(per_crop)(off_s)  # (K, T, crop, crop, 3)

    out = jax.vmap(per_sample)(y, c, offs)  # (B, K, T, crop, crop, 3)
    return jnp.moveaxis(out, 1, 2)


def temporal_median(frames: jax.Array) -> jax.Array:
    """Median over the frame axis: (T, H, W, C) -> (H, W, C) uint8.

    Device-side equivalent of ``bg_extraction_tmf`` (comix_loader.py:148-164).
    """
    median = jnp.median(frames.astype(jnp.float32), axis=0)
    return jnp.clip(jnp.round(median), 0, 255).astype(jnp.uint8)


def boxes_union_mask(boxes: jax.Array, h: int, w: int) -> jax.Array:
    """(..., K, 4) float [x0, y0, x1, y1] boxes -> (..., H, W) bool union.

    Rasterization matches the reference's numpy slicing exactly
    (libs/pipelines/box.py BuildHumanMask/SceneCutOut/ActorCutOut:
    ``mask[int(y0):int(y1), int(x0):int(x1)] = 1``): coordinates truncate
    toward zero and the box is half-open. Degenerate/padding boxes
    (x1 <= x0 or y1 <= y0 after truncation) contribute nothing, so a fixed
    K with (0, 0, 0, 0) padding is exact.
    """
    b = boxes.astype(jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    xs = jnp.arange(w, dtype=jnp.int32)
    y_in = (ys >= b[..., 1:2]) & (ys < b[..., 3:4])  # (..., K, H)
    x_in = (xs >= b[..., 0:1]) & (xs < b[..., 2:3])  # (..., K, W)
    in_box = y_in[..., :, None] & x_in[..., None, :]  # (..., K, H, W)
    return jnp.any(in_box, axis=-3)


def acm_composite(
    actor_u8: jax.Array,
    scene_u8: jax.Array,
    actor_boxes: jax.Array,
    scene_boxes: jax.Array,
    actor_full_mask: jax.Array,
    fill: int = 127,
) -> jax.Array:
    """ActorCutMix device compositing (reference actor_cut_mix_loader.py:117-133
    + box.py ActorCutOut/BuildHumanMask semantics):

      * the scene clip's own humans are erased with ``fill``
        (ActorCutOut; empty scene boxes -> no-op, handled by empty masks)
      * the actor clip's human-box union replaces those pixels
        (imgs = actor * mask + scene * (1 - mask))
      * clips whose action video has NO detections use an all-ones mask
        (BuildHumanMask special case) -> the composite is the actor clip

    Args:
      actor_u8, scene_u8: (B, T, H, W, C) uint8 (already flipped).
      actor_boxes, scene_boxes: (B, T, K, 4) float32 in output coords.
      actor_full_mask: (B,) bool — True when the action clip has no
        detections at all.
    """
    h, w = actor_u8.shape[2], actor_u8.shape[3]
    amask = boxes_union_mask(actor_boxes, h, w)  # (B, T, H, W)
    amask = amask | actor_full_mask[:, None, None, None]
    smask = boxes_union_mask(scene_boxes, h, w)
    scene = jnp.where(smask[..., None], jnp.uint8(fill), scene_u8)
    return jnp.where(amask[..., None], actor_u8, scene)
