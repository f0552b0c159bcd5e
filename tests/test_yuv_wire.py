"""YUV420 wire-format decode path: host emits the JPEG's stored planes
(native.decode_yuv420_batch), the device reconstructs RGB
(ops.augment.yuv420_to_rgb). Halves host->device wire bytes vs RGB u8 —
the measured e2e bottleneck on CPU-quota-limited hosts (PERF_NOTES).

Fidelity contract tested here:
  * device fancy-upsample == libjpeg h2v2_fancy_upsample (numpy oracle)
  * identity geometry: YUV wire + device reconstruct is BIT-IDENTICAL to
    the host RGB decode (same libjpeg planes, same fixed-point math)
  * resize geometry: close to the RGB path (plane-resize reordering only)
  * non-420 inputs fall back to RGB decode + forward conversion
"""

import pathlib

import cv2
import numpy as np
import pytest

from bdvcil_tpu.data import native

needs_yuv = pytest.mark.skipif(
    not (native.available() and native.has_yuv420()),
    reason="native decoder without yuv420 kernel",
)


def _smooth_img(rng, h, w):
    img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    return cv2.GaussianBlur(img, (7, 7), 3)


@pytest.fixture(scope="module")
def jpegs420(tmp_path_factory):
    root = tmp_path_factory.mktemp("yuv_jpegs")
    rng = np.random.default_rng(7)
    paths = []
    for i, (h, w) in enumerate([(256, 256), (240, 320), (180, 226)]):
        p = root / f"img_{i}.jpg"
        # cv2 writes 4:2:0 chroma subsampling by default
        cv2.imwrite(str(p), _smooth_img(rng, h, w), [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))
    return paths


def fancy_upsample2x_oracle(p):
    """libjpeg jdsample.c h2v2_fancy_upsample, straight-line numpy."""
    p = p.astype(np.int64)
    h, w = p.shape
    pad = np.pad(p, 1, mode="edge")
    out = np.zeros((2 * h, 2 * w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            c = pad[y + 1, x + 1]
            for oy, vy in ((0, y), (1, y + 2)):
                v = pad[vy, x + 1]
                for ox, vx, bias in ((0, x, 8), (1, x + 2, 7)):
                    d = pad[vy, vx]
                    hh = pad[y + 1, vx]
                    out[2 * y + oy, 2 * x + ox] = (9 * c + 3 * hh + 3 * v + d + bias) >> 4
    return out.astype(np.uint8)


def test_fancy_upsample_matches_libjpeg_oracle():
    from bdvcil_tpu.ops.augment import fancy_upsample2x

    rng = np.random.default_rng(0)
    plane = rng.integers(0, 256, size=(6, 9)).astype(np.uint8)
    ours = np.asarray(fancy_upsample2x(plane))
    np.testing.assert_array_equal(ours, fancy_upsample2x_oracle(plane))


@needs_yuv
def test_identity_geometry_bit_exact_vs_rgb_kernel(jpegs420):
    """No resize, full-image square crop: the YUV wire carries libjpeg's own
    planes and the device redoes exactly libjpeg's upsample+convert, so the
    reconstruction must equal the host RGB decode bit for bit."""
    from bdvcil_tpu.ops.augment import yuv420_to_rgb

    p = jpegs420[0]  # the square 256x256 image
    dims = np.array([[256, 256]], dtype=np.int32)
    rgb = native.decode_resize2_crop_batch([p], dims, 256, 256, [(0, 0)])
    y, c = native.decode_yuv420_batch([p], dims, 256, [(0, 0)])
    recon = np.asarray(yuv420_to_rgb(y, c))
    np.testing.assert_array_equal(recon, rgb)


@needs_yuv
def test_resize_geometry_close_to_rgb_kernel(jpegs420):
    """Real train geometry (anisotropic resize + offset crop): plane-space
    resize reorders the interpolation vs RGB-space resize; on smooth content
    the reconstruction stays within ~1 gray level of the RGB path."""
    from bdvcil_tpu.ops.augment import yuv420_to_rgb

    dims = np.array([[292, 292], [342, 256], [288, 230]], dtype=np.int32)
    crops = [(10, 20), (64, 8), (0, 0)]
    rgb = native.decode_resize2_crop_batch(jpegs420, dims, 224, 224, crops)
    y, c = native.decode_yuv420_batch(jpegs420, dims, 224, crops)
    recon = np.asarray(yuv420_to_rgb(y, c))
    assert recon.shape == rgb.shape
    diff = np.abs(recon.astype(int) - rgb.astype(int))
    assert diff.mean() < 1.5, diff.mean()
    assert np.mean((recon.astype(float) - rgb.astype(float)) ** 2) < 30  # ~33+ dB


@needs_yuv
def test_upscale_fallback_geometry(jpegs420):
    """Crop window larger than the resize target exercises the two-stage
    squash fallback in both kernels."""
    from bdvcil_tpu.ops.augment import yuv420_to_rgb

    p = jpegs420[2]
    dims = np.array([[200, 160]], dtype=np.int32)
    rgb = native.decode_resize2_crop_batch([p], dims, 224, 224, [(0, 0)])
    y, c = native.decode_yuv420_batch([p], dims, 224, [(0, 0)])
    recon = np.asarray(yuv420_to_rgb(y, c))
    diff = np.abs(recon.astype(int) - rgb.astype(int))
    assert diff.mean() < 2.5, diff.mean()


@needs_yuv
def test_non420_jpeg_falls_back(tmp_path):
    """4:4:4-sampled JPEG takes the RGB decode + forward-convert path and
    still reconstructs closely."""
    if not hasattr(cv2, "IMWRITE_JPEG_SAMPLING_FACTOR"):
        pytest.skip("cv2 without sampling-factor control")
    from bdvcil_tpu.ops.augment import yuv420_to_rgb

    rng = np.random.default_rng(3)
    p = str(tmp_path / "s444.jpg")
    cv2.imwrite(
        p,
        _smooth_img(rng, 200, 240),
        [
            cv2.IMWRITE_JPEG_QUALITY,
            95,
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444,
        ],
    )
    dims = np.array([[256, 214]], dtype=np.int32)
    rgb = native.decode_resize2_crop_batch([p], dims, 196, 196, [(5, 5)])
    y, c = native.decode_yuv420_batch([p], dims, 196, [(5, 5)])
    recon = np.asarray(yuv420_to_rgb(y, c))
    # forward 2x2-average + fancy-upsample round trip softens chroma; luma
    # is exact, so the overall error stays small on smooth content
    diff = np.abs(recon.astype(int) - rgb.astype(int))
    assert diff.mean() < 3.0, diff.mean()


@needs_yuv
def test_decode_failure_reports_index(jpegs420, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    dims = np.array([[256, 256], [256, 256]], dtype=np.int32)
    with pytest.raises(IOError):
        native.decode_yuv420_batch([jpegs420[0], bad], dims, 128, [(0, 0), (0, 0)])


# ---------------------------------------------------------------------------
# decoded-plane LRU cache (native/decoder.cpp PlaneCache)
# ---------------------------------------------------------------------------


needs_cache = pytest.mark.skipif(
    not (native.available() and native.decode_cache_stats() is not None),
    reason="native decoder without plane cache",
)


@pytest.fixture
def plane_cache():
    """Fresh, enabled cache for the test; restore the default budget after."""
    native.decode_cache_set_budget_mb(512)
    native.decode_cache_clear()
    yield
    native.decode_cache_set_budget_mb(512)
    native.decode_cache_clear()


@needs_cache
def test_cache_warm_hits_are_bit_identical(jpegs420, plane_cache):
    """Epoch 2+ replays the windowed resize from cached planes — outputs
    must match the uncached decode bit for bit at real train geometry."""
    dims = np.array([[292, 292], [342, 256], [288, 230]], dtype=np.int32)
    crops = [(10, 20), (64, 8), (0, 0)]
    native.decode_cache_set_budget_mb(0)  # uncached baseline
    y0, c0 = native.decode_yuv420_batch(jpegs420, dims, 224, crops)
    native.decode_cache_set_budget_mb(512)
    y1, c1 = native.decode_yuv420_batch(jpegs420, dims, 224, crops)  # cold fill
    y2, c2 = native.decode_yuv420_batch(jpegs420, dims, 224, crops)  # warm
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(y0, y2)
    np.testing.assert_array_equal(c0, c2)
    stats = native.decode_cache_stats()
    assert stats["hits"] >= len(jpegs420)
    assert stats["entries"] == len(jpegs420)


@needs_cache
def test_cache_invalidates_on_overwrite(tmp_path, plane_cache):
    """A path rewritten with new content must be re-decoded (mtime+size
    validation), never served stale."""
    rng = np.random.default_rng(11)
    p = str(tmp_path / "mut.jpg")
    dims = np.array([[240, 180]], dtype=np.int32)
    cv2.imwrite(p, _smooth_img(rng, 180, 240), [cv2.IMWRITE_JPEG_QUALITY, 95])
    y_a, _ = native.decode_yuv420_batch([p], dims, 128, [(0, 0)])
    import time

    time.sleep(0.01)  # ensure a distinct mtime stamp
    cv2.imwrite(p, _smooth_img(rng, 180, 240), [cv2.IMWRITE_JPEG_QUALITY, 95])
    y_b, _ = native.decode_yuv420_batch([p], dims, 128, [(0, 0)])
    assert not np.array_equal(y_a, y_b)
    native.decode_cache_set_budget_mb(0)
    native.decode_cache_set_budget_mb(512)
    y_ref, _ = native.decode_yuv420_batch([p], dims, 128, [(0, 0)])
    np.testing.assert_array_equal(y_b, y_ref)


@needs_cache
def test_cache_respects_byte_budget(tmp_path, plane_cache):
    """Residency stays under the configured budget via LRU eviction."""
    rng = np.random.default_rng(5)
    paths = []
    for i in range(12):  # 12 x (320x240 planes ~ 115 KB) >> 1 MB budget
        p = str(tmp_path / f"b{i}.jpg")
        cv2.imwrite(p, _smooth_img(rng, 240, 320), [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    native.decode_cache_set_budget_mb(1)
    dims = np.tile(np.array([[320, 240]], dtype=np.int32), (len(paths), 1))
    native.decode_yuv420_batch(paths, dims, 224, [(0, 0)] * len(paths))
    stats = native.decode_cache_stats()
    assert 0 < stats["bytes"] <= 1 * 1024 * 1024
    assert 0 < stats["entries"] < len(paths)


@needs_cache
def test_cache_disable_keeps_nothing(jpegs420, plane_cache):
    native.decode_cache_set_budget_mb(0)
    dims = np.array([[256, 256]], dtype=np.int32)
    native.decode_yuv420_batch(jpegs420[:1], dims, 128, [(0, 0)])
    stats = native.decode_cache_stats()
    assert stats["entries"] == 0 and stats["bytes"] == 0


# ---------------------------------------------------------------------------
# loader + jitted input_fn integration
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wire_env(tmp_path_factory):
    from bdvcil_tpu.data.datasets import RawframeDataset
    from tests.synthetic import make_rawframe_tree

    root = tmp_path_factory.mktemp("wire")
    frames_root, train_ann, _ = make_rawframe_tree(
        root, num_classes=2, videos_per_class=3, num_frames=8, size=(120, 156)
    )
    ds = RawframeDataset(str(train_ann), [], data_prefix=str(frames_root))
    # bg pool: first frame of each video (content irrelevant to the wire test)
    bg_files = [
        str(pathlib.Path(info["frame_dir"]) / "img_00001.jpg") for info in ds.video_infos[:3]
    ]
    return ds, bg_files


@needs_yuv
def test_loader_wire_formats_agree(wire_env):
    """Same seed, both wire formats: identical metadata/masks/keys, and the
    device-reconstructed pixels stay within ~1 gray level of the RGB wire."""
    from bdvcil_tpu.data.device_pipeline import FastBGMixLoader
    from bdvcil_tpu.ops.augment import yuv420_to_rgb

    ds, bg_files = wire_env
    mk = lambda wf: FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=96,
        short_side=112, randaug_prob=0.5, seed=11, wire_format=wf,
    )
    rgb = next(iter(mk("rgb")))
    yuv = next(iter(mk("yuv420")))
    for k in ("label", "apply_bgmix", "apply_randaug", "randaug_key", "flip"):
        np.testing.assert_array_equal(rgb[k], yuv[k])
    assert yuv["imgs_y"].shape == (4, 4, 96, 96)
    assert yuv["imgs_c"].shape == (4, 4, 48, 48, 2)
    recon = np.asarray(yuv420_to_rgb(yuv["imgs_y"], yuv["imgs_c"]))
    diff = np.abs(recon.astype(int) - rgb["imgs_u8"].astype(int))
    assert diff.mean() < 2.0, diff.mean()
    bg_recon = np.asarray(yuv420_to_rgb(yuv["bg_y"], yuv["bg_c"]))
    assert np.abs(bg_recon.astype(int) - rgb["bg_u8"].astype(int)).mean() < 2.0


@needs_yuv
def test_input_fn_yuv_wire_jits_and_matches(wire_env):
    """make_fast_input_fn(wire_format='yuv420') compiles under jit (randaug
    on) and, with randaug off, its output matches the RGB wire's to within
    the wire reconstruction error in normalized units."""
    import jax
    import jax.numpy as jnp

    from bdvcil_tpu.data.device_pipeline import FastBGMixLoader, make_fast_input_fn

    ds, bg_files = wire_env
    mk = lambda wf: FastBGMixLoader(
        ds.video_infos, bg_files, batch_size=4, num_segments=4, crop_size=96,
        short_side=112, randaug_prob=0.5, seed=11, wire_format=wf,
    )
    rgb = next(iter(mk("rgb")))
    yuv = next(iter(mk("yuv420")))

    fn_rgb = make_fast_input_fn(with_randaug=False)
    fn_yuv = make_fast_input_fn(with_randaug=False, wire_format="yuv420")
    out_rgb = np.asarray(jax.jit(fn_rgb)(rgb))
    out_yuv = np.asarray(jax.jit(fn_yuv)(yuv))
    assert out_rgb.shape == out_yuv.shape
    # ~1 u8 step = ~0.018 normalized; wire error is sub-level on average
    assert np.abs(out_rgb - out_yuv).mean() < 0.05

    # randaug path: shapes/dtype sane under jit with the yuv wire
    fn_aug = make_fast_input_fn(with_randaug=True, dtype=jnp.bfloat16, wire_format="yuv420")
    out_aug = jax.jit(fn_aug)(yuv)
    assert out_aug.shape == out_yuv.shape
    assert out_aug.dtype == jnp.bfloat16
