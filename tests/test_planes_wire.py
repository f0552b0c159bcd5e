"""'planes' wire format: host ships STORED-resolution YCbCr planes
(native.fetch_planes_batch), the device runs the windowed bilinear resize as
exact integer matmuls on the MXU (ops.augment.resize_plane_bilinear_taps)
and then the usual YUV->RGB reconstruct. Moves the host's per-frame resize
work (the measured steady-state producer cost) onto idle MXU cycles.

Fidelity contract tested here:
  * resize_plane_bilinear_taps == the C++ fixed-point windowed resize,
    bit for bit (numpy oracle of bilinear_resize_window_t)
  * FastBGMixLoader 'planes' wire -> device resize is BIT-IDENTICAL to the
    'yuv420' wire (the host-resized planes), so the jitted input_fn output
    is bit-identical across the two wires
  * fallback frames (non-420 JPEG, squash geometry, sources over the pixel
    cap, probe-dim mismatch) are host-resized + identity-tapped and keep
    bit-identity
  * the running pad grows across batches without changing any pixel
"""

import pathlib

import cv2
import numpy as np
import pytest

from bdvcil_tpu.data import native
from bdvcil_tpu.data.device_pipeline import (
    FastBGMixLoader,
    identity_plane_taps,
    make_fast_input_fn,
    plane_resize_taps,
)

needs_planes = pytest.mark.skipif(
    not (native.available() and native.has_fetch_planes() and native.has_yuv420()),
    reason="native decoder without fetch_planes kernel",
)


# ---------------------------------------------------------------------------
# numpy oracle of the C++ two-pass fixed-point resize (decoder.cpp
# bilinear_resize_window_t): hresize to value*256, then
# (r0*wy0 + r1*wy1 + 32768) >> 16
# ---------------------------------------------------------------------------


def resize_with_taps_oracle(plane, taps):
    x0, x1, xw, y0, y1, yw = (np.asarray(r) for r in taps)
    p = plane.astype(np.int64)
    h = p[:, x0] * (256 - xw)[None, :] + p[:, x1] * xw[None, :]
    acc = h[y0, :] * (256 - yw)[:, None] + h[y1, :] * yw[:, None]
    return ((acc + 32768) >> 16).astype(np.uint8)


def _random_taps(rng, sw, sh, out):
    """Real-geometry taps: random window of a random anisotropic resize."""
    while True:
        dw = int(rng.integers(out, 2 * max(sw, out)))
        dh = int(rng.integers(out, 2 * max(sh, out)))
        cx = int(rng.integers(0, dw - out + 1))
        cy = int(rng.integers(0, dh - out + 1))
        taps = plane_resize_taps(sw, sh, dw, dh, cx, cy, out)
        if taps is not None:
            return taps


def test_resize_op_matches_oracle():
    import jax

    from bdvcil_tpu.ops.augment import resize_plane_bilinear_taps

    rng = np.random.default_rng(0)
    b, t, hp, wp, out = 3, 2, 60, 84, 48
    planes = rng.integers(0, 256, (b, t, hp, wp), dtype=np.uint8)
    taps = np.stack(
        [_random_taps(rng, wp, hp, out)] +
        [_random_taps(rng, wp - 5, hp - 9, out)] +  # padded source: taps < dims
        [identity_plane_taps(out)]
    )
    got = np.asarray(
        jax.jit(resize_plane_bilinear_taps, static_argnums=2)(planes, taps, out)
    )
    for i in range(b):
        for k in range(t):
            np.testing.assert_array_equal(
                got[i, k], resize_with_taps_oracle(planes[i, k], taps[i])
            )

    # channelled variant (chroma layout)
    cpl = rng.integers(0, 256, (b, t, hp, wp, 2), dtype=np.uint8)
    gotc = np.asarray(
        jax.jit(resize_plane_bilinear_taps, static_argnums=2)(cpl, taps, out)
    )
    for i in range(b):
        for k in range(t):
            for ch in range(2):
                np.testing.assert_array_equal(
                    gotc[i, k, :, :, ch],
                    resize_with_taps_oracle(cpl[i, k, :, :, ch], taps[i]),
                )


@needs_planes
def test_taps_match_native_windowed_resize(tmp_path):
    """plane_resize_taps mirrors the C++ float index math exactly: oracle
    resize of the fetched stored planes == decode_yuv420_batch output, for
    random geometries on even/odd-sized sources."""
    rng = np.random.default_rng(3)
    cases = [(240, 320), (180, 226), (121, 159)]  # (h, w); odd dims included
    for ci, (h, w) in enumerate(cases):
        p = str(tmp_path / f"src{ci}.jpg")
        img = cv2.GaussianBlur(
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8), (7, 7), 3
        )
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        pad_w, pad_h = -(-w // 16) * 16, -(-h // 16) * 16
        y, c, dims = native.fetch_planes_batch([p], pad_w, pad_h, num_threads=1)
        assert dims[0].tolist() == [w, h]
        out = 96
        for _ in range(10):
            dw = int(rng.integers(out, 2 * w))
            dh = int(rng.integers(out, 2 * h))
            cx = int(rng.integers(0, dw - out + 1))
            cy = int(rng.integers(0, dh - out + 1))
            ty = plane_resize_taps(w, h, dw, dh, cx, cy, out)
            tc = plane_resize_taps(
                (w + 1) // 2, (h + 1) // 2, (dw + 1) // 2, (dh + 1) // 2,
                cx // 2, cy // 2, out // 2,
            )
            if ty is None or tc is None:
                continue
            ry, rc = native.decode_yuv420_batch(
                [p], np.array([(dw, dh)], np.int32), out, [(cx, cy)], num_threads=1
            )
            np.testing.assert_array_equal(
                resize_with_taps_oracle(y[0], ty), ry[0]
            )
            np.testing.assert_array_equal(
                resize_with_taps_oracle(c[0][..., 0], tc), rc[0][..., 0]
            )
            np.testing.assert_array_equal(
                resize_with_taps_oracle(c[0][..., 1], tc), rc[0][..., 1]
            )


# ---------------------------------------------------------------------------
# loader + jitted input_fn: planes wire vs yuv420 wire, bit-identical
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wire_env(tmp_path_factory):
    from bdvcil_tpu.data.datasets import RawframeDataset
    from tests.synthetic import make_rawframe_tree

    root = tmp_path_factory.mktemp("planes_wire")
    frames_root, train_ann, _ = make_rawframe_tree(
        root, num_classes=2, videos_per_class=3, num_frames=8, size=(120, 156)
    )
    ds = RawframeDataset(str(train_ann), [], data_prefix=str(frames_root))
    bg_files = [
        str(pathlib.Path(info["frame_dir"]) / "img_00001.jpg")
        for info in ds.video_infos[:3]
    ]
    return ds, bg_files


def _device_resized_planes(batch):
    """Run the planes-wire device resize, returning (y, c, bg_y, bg_c)."""
    import jax

    from bdvcil_tpu.ops.augment import resize_plane_bilinear_taps

    crop = batch["imgs_taps_y"].shape[-1]
    half = batch["imgs_taps_c"].shape[-1]
    f = jax.jit(resize_plane_bilinear_taps, static_argnums=2)
    y = np.asarray(f(batch["imgs_y"], batch["imgs_taps_y"], crop))
    c = np.asarray(f(batch["imgs_c"], batch["imgs_taps_c"], half))
    bgy = np.asarray(f(batch["bg_y"][:, None], batch["bg_taps_y"], crop))[:, 0]
    bgc = np.asarray(f(batch["bg_c"][:, None], batch["bg_taps_c"], half))[:, 0]
    return y, c, bgy, bgc


@needs_planes
def test_loader_planes_wire_bit_identical_to_yuv420(wire_env):
    ds, bg_files = wire_env
    mk = lambda wf: FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=96,
        short_side=112, randaug_prob=0.5, seed=11, wire_format=wf,
    )
    yuv = next(iter(mk("yuv420")))
    pl = next(iter(mk("planes")))
    for k in ("label", "apply_bgmix", "apply_randaug", "randaug_key", "flip"):
        np.testing.assert_array_equal(yuv[k], pl[k])
    y, c, bgy, bgc = _device_resized_planes(pl)
    np.testing.assert_array_equal(y, yuv["imgs_y"])
    np.testing.assert_array_equal(c, yuv["imgs_c"])
    np.testing.assert_array_equal(bgy, yuv["bg_y"])
    np.testing.assert_array_equal(bgc, yuv["bg_c"])


@needs_planes
def test_input_fn_planes_wire_bit_identical_to_yuv420(wire_env):
    """The full jitted input path (resize + reconstruct + randaug + blend +
    normalize) produces bit-identical tensors across the two wires."""
    import jax

    ds, bg_files = wire_env
    mk = lambda wf: FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=96,
        short_side=112, randaug_prob=0.5, seed=11, wire_format=wf,
    )
    yuv = next(iter(mk("yuv420")))
    pl = next(iter(mk("planes")))
    fn_yuv = jax.jit(make_fast_input_fn(with_randaug=True, wire_format="yuv420"))
    fn_pl = jax.jit(make_fast_input_fn(with_randaug=True, wire_format="planes"))
    out_yuv = np.asarray(fn_yuv({k: v for k, v in yuv.items() if k != "label"}))
    out_pl = np.asarray(fn_pl({k: v for k, v in pl.items() if k != "label"}))
    np.testing.assert_array_equal(out_yuv, out_pl)


@needs_planes
def test_planes_wire_fallbacks_keep_bit_identity(tmp_path):
    """Mixed batch: a grayscale (non-420) video, a source over the pixel cap
    and a tiny background (squash geometry) all take the host-resize +
    identity-taps fallback — output still equals the yuv420 wire exactly."""
    rng = np.random.default_rng(5)
    infos = []
    # video 0: normal color; video 1: grayscale JPEG frames (non-420);
    # video 2: large source that the pixel cap forces to fall back
    for v, (h, w, gray) in enumerate([(120, 156, False), (120, 156, True), (260, 340, False)]):
        vdir = tmp_path / f"v{v}"
        vdir.mkdir()
        for t in range(1, 7):
            img = cv2.GaussianBlur(
                rng.integers(0, 255, (h, w, 3)).astype(np.uint8), (5, 5), 2
            )
            if gray:
                g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
                cv2.imwrite(str(vdir / f"img_{t:05}.jpg"), g)
            else:
                cv2.imwrite(str(vdir / f"img_{t:05}.jpg"), img)
        infos.append(dict(frame_dir=str(vdir), total_frames=6, label=v))
    # tiny background: RandomCrop target larger than its resize -> squash
    bg = tmp_path / "bg.jpg"
    cv2.imwrite(str(bg), rng.integers(0, 255, (40, 44, 3)).astype(np.uint8))

    mk = lambda wf: FastBGMixLoader(
        infos, [str(bg)], batch_size=3, num_segments=4, crop_size=96,
        short_side=112, bg_short_side=64, randaug_prob=-1.0, seed=2,
        wire_format=wf, shuffle=False,
    )
    loader_pl = mk("planes")
    loader_pl.planes_max_px = 200 * 200  # force the big video over the cap
    yuv = next(iter(mk("yuv420")))
    pl = next(iter(loader_pl))
    y, c, bgy, bgc = _device_resized_planes(pl)
    np.testing.assert_array_equal(y, yuv["imgs_y"])
    np.testing.assert_array_equal(c, yuv["imgs_c"])
    np.testing.assert_array_equal(bgy, yuv["bg_y"])
    np.testing.assert_array_equal(bgc, yuv["bg_c"])
    # the capped source must not have grown the pad
    assert loader_pl._pad_w <= 160 and loader_pl._pad_h <= 128


@needs_planes
def _mixed_res_corpus(tmp_path):
    rng = np.random.default_rng(9)
    infos = []
    for v, (h, w) in enumerate([(100, 132, ), (150, 190)]):
        vdir = tmp_path / f"v{v}"
        vdir.mkdir()
        for t in range(1, 7):
            img = cv2.GaussianBlur(
                rng.integers(0, 255, (h, w, 3)).astype(np.uint8), (5, 5), 2
            )
            cv2.imwrite(str(vdir / f"img_{t:05}.jpg"), img)
        infos.append(dict(frame_dir=str(vdir), total_frames=6, label=v))
    bg = str(pathlib.Path(infos[0]["frame_dir"]) / "img_00001.jpg")
    return infos, bg


def test_planes_wire_pad_fixed_from_corpus(tmp_path):
    """Pad dims are fixed from the WHOLE corpus before iteration (pure
    function of the dataset): every batch ships the same shape — no mid-run
    recompile, no worker-count-dependent shapes — and pixels still match the
    yuv420 wire exactly."""
    infos, bg = _mixed_res_corpus(tmp_path)

    mk = lambda wf, **kw: FastBGMixLoader(
        infos, [bg], batch_size=1, num_segments=4, crop_size=96,
        short_side=112, randaug_prob=0.5, seed=4, wire_format=wf, shuffle=False,
        **kw,
    )
    yuv_batches = list(mk("yuv420"))
    pl_batches = list(mk("planes"))
    pads = {b["imgs_y"].shape[-2:] for b in pl_batches}
    assert len(pads) == 1  # one corpus-wide pad covering the largest source
    (ph, pw) = next(iter(pads))
    assert pw >= 190 and ph >= 150  # covers the larger video
    for yb, pb in zip(yuv_batches, pl_batches):
        y, c, bgy, bgc = _device_resized_planes(pb)
        np.testing.assert_array_equal(y, yb["imgs_y"])
        np.testing.assert_array_equal(c, yb["imgs_c"])
        np.testing.assert_array_equal(bgy, yb["bg_y"])
        np.testing.assert_array_equal(bgc, yb["bg_c"])

    # worker-count invariance: with 2 producer workers the batches (shapes
    # AND content) are identical — the pad is not a shared mutable race
    pl_batches_w2 = list(mk("planes", num_workers=2))
    assert len(pl_batches_w2) == len(pl_batches)
    for b1, b2 in zip(pl_batches, pl_batches_w2):
        assert set(b1) == set(b2)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k])
