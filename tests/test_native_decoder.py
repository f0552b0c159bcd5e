import cv2
import numpy as np
import pytest

from bdvcil_tpu.data import native


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (90, 140), (200, 150)]):
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        # smooth it so JPEG error is small and decoder-independent
        img = cv2.GaussianBlur(img, (7, 7), 3)
        p = root / f"img_{i}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))
    return paths


needs_native = pytest.mark.skipif(not native.available(), reason="native decoder not built")


@needs_native
def test_decode_file_matches_cv2(jpegs):
    for p in jpegs:
        ours = native.decode_file(p)
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert ours.shape == ref.shape
        # both stacks use libjpeg-family decoders; allow minor IDCT differences
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.mean() < 2.0
        assert (diff <= 16).mean() > 0.999


@needs_native
def test_batch_resize_center_crop(jpegs):
    out = native.decode_resize_crop_batch(jpegs, short_side=96, out_h=80, out_w=80)
    assert out.shape == (3, 80, 80, 3)
    assert out.dtype == np.uint8

    # compare against the cv2 reference pipeline for image 0
    ref = cv2.cvtColor(cv2.imread(jpegs[0]), cv2.COLOR_BGR2RGB)
    h, w = ref.shape[:2]
    factor = 96 / min(h, w)
    rw, rh = int(w * factor + 0.5), int(h * factor + 0.5)
    ref = cv2.resize(ref, (rw, rh), interpolation=cv2.INTER_LINEAR)
    cx, cy = (rw - 80) // 2, (rh - 80) // 2
    ref = ref[cy : cy + 80, cx : cx + 80]
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert diff.mean() < 4.0  # decoder + resize rounding tolerance


@needs_native
def test_batch_explicit_crops(jpegs):
    out = native.decode_resize_crop_batch(
        jpegs, short_side=96, out_h=64, out_w=64, crops=[(0, 0), (5, 5), (10, 0)]
    )
    assert out.shape == (3, 64, 64, 3)
    # different crops of the same resized image differ
    out2 = native.decode_resize_crop_batch(
        jpegs, short_side=96, out_h=64, out_w=64, crops=[(20, 20), (5, 5), (10, 0)]
    )
    assert not np.array_equal(out[0], out2[0])
    np.testing.assert_array_equal(out[1], out2[1])


@needs_native
def test_decode_failure_reports_index(jpegs, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    with pytest.raises(IOError):
        native.decode_resize_crop_batch([jpegs[0], bad], short_side=96, out_h=64, out_w=64)


# ---------------------------------------------------------------------------
# decoded-plane cache on the RGB decode paths (native/decoder.cpp
# decode_rgb_cached): cache hits reconstruct RGB from the stored YCbCr planes
# with libjpeg's own fancy-upsample + color-convert chain (planes_to_rgb), so
# enabling the cache must never change a single pixel vs the direct decode.
# ---------------------------------------------------------------------------

needs_cache = pytest.mark.skipif(
    not (native.available() and native.decode_cache_stats() is not None),
    reason="native decoder without plane cache",
)


@pytest.fixture
def plane_cache():
    native.decode_cache_set_budget_mb(512)
    native.decode_cache_clear()
    yield
    native.decode_cache_set_budget_mb(512)
    native.decode_cache_clear()


@pytest.fixture(scope="module")
def rgb_cache_jpegs(tmp_path_factory):
    """Even AND odd dimensions: odd sizes exercise the edge rows/columns of
    the h2v2 fancy upsample (chroma planes are ceil(w/2) x ceil(h/2))."""
    root = tmp_path_factory.mktemp("rgbcache")
    rng = np.random.default_rng(7)
    paths = []
    for i, (h, w) in enumerate([(120, 160), (91, 141), (200, 151), (77, 103)]):
        img = cv2.GaussianBlur(
            rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8), (5, 5), 2
        )
        p = root / f"rc_{i}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))
    return paths


def _cold_warm_equal(call):
    """Run ``call()`` uncached / cache-cold / cache-warm and assert all three
    outputs are bit-identical; returns the warm stats."""
    native.decode_cache_set_budget_mb(0)
    base = call()
    native.decode_cache_set_budget_mb(512)
    native.decode_cache_clear()
    cold = call()
    warm = call()
    np.testing.assert_array_equal(base, cold)
    np.testing.assert_array_equal(base, warm)
    return native.decode_cache_stats()


@needs_cache
def test_rgb_resize_crop_cache_bit_identical(rgb_cache_jpegs, plane_cache):
    stats = _cold_warm_equal(
        lambda: native.decode_resize_crop_batch(
            rgb_cache_jpegs, short_side=96, out_h=80, out_w=80
        )
    )
    assert stats["hits"] >= len(rgb_cache_jpegs)
    assert stats["entries"] == len(rgb_cache_jpegs)


@needs_cache
def test_rgb_resize2_crop_cache_bit_identical(rgb_cache_jpegs, plane_cache):
    # anisotropic per-image targets, incl. an upscale row (the two-stage
    # squash fallback) and explicit crops
    dims = np.array([[180, 130], [150, 97], [160, 210], [220, 160]], dtype=np.int32)
    crops = [(10, 20), (40, 8), (0, 0), (-1, -1)]
    stats = _cold_warm_equal(
        lambda: native.decode_resize2_crop_batch(
            rgb_cache_jpegs, dims, out_h=64, out_w=64, crops=crops
        )
    )
    assert stats["hits"] >= len(rgb_cache_jpegs)


@needs_cache
def test_rgb_tencrop_cache_bit_identical(rgb_cache_jpegs, plane_cache):
    stats = _cold_warm_equal(
        lambda: native.decode_tencrop_batch(rgb_cache_jpegs, short_side=96, crop=64)
    )
    assert stats["hits"] >= len(rgb_cache_jpegs)


@needs_cache
def test_rgb_cache_skips_dct_scaled_sources(tmp_path, plane_cache):
    """A source large enough that the direct path decodes DCT-downscaled must
    bypass the cache entirely (full-res planes could not reproduce the
    scaled decode) — identical output, nothing cached."""
    rng = np.random.default_rng(3)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, size=(600, 800, 3)).astype(np.uint8), (7, 7), 3
    )
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    # short_side 96 on a 600-short source -> denom 4 DCT scale in the direct path
    stats = _cold_warm_equal(
        lambda: native.decode_resize_crop_batch([p], short_side=96, out_h=80, out_w=80)
    )
    assert stats["entries"] == 0


@needs_cache
def test_rgb_cache_geometry_rejection_counts_as_miss(tmp_path, plane_cache):
    """A cached entry the RGB geometry would DCT-downscale is a telemetry
    MISS (and not LRU-promoted): the direct decode runs anyway, so counting
    it a hit would report ~1.0 hit_rate while warm decode is actually cold."""
    rng = np.random.default_rng(5)
    img = cv2.GaussianBlur(
        rng.integers(0, 255, size=(600, 800, 3)).astype(np.uint8), (7, 7), 3
    )
    p = str(tmp_path / "big.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    native.decode_cache_set_budget_mb(512)
    native.decode_cache_clear()
    # cache the full-res planes via the yuv420 wire path (serves any size)
    native.decode_yuv420_batch(
        [p], np.array([[800, 600]], dtype=np.int32), out_size=96, crops=[(0, 0)]
    )
    assert native.decode_cache_stats()["entries"] == 1
    ref = native.decode_resize_crop_batch([p], short_side=96, out_h=80, out_w=80)
    before = native.decode_cache_stats()
    # short_side 96 on a 600-short source -> denom 4 DCT scale: the RGB path
    # must reject the cached full-res entry and count a miss, twice
    out = native.decode_resize_crop_batch([p], short_side=96, out_h=80, out_w=80)
    out2 = native.decode_resize_crop_batch([p], short_side=96, out_h=80, out_w=80)
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(out2, ref)
    after = native.decode_cache_stats()
    assert after["hits"] == before["hits"]
    assert after["misses"] >= before["misses"] + 2


@needs_cache
def test_rgb_cache_full_decode_matches_libjpeg(rgb_cache_jpegs, plane_cache):
    """planes_to_rgb must replay libjpeg's full-res decode chain bit for bit:
    pin the identity-geometry decode (no resize: dims == stored dims, crop at
    origin covering the full image) cached vs direct."""
    for p in rgb_cache_jpegs:
        ref = native.decode_file(p)  # direct libjpeg full decode (uncached API)
        h, w = ref.shape[:2]
        native.decode_cache_clear()
        out = native.decode_resize2_crop_batch(
            [p], np.array([[w, h]], dtype=np.int32), out_h=h, out_w=w, crops=[(0, 0)]
        )[0]
        np.testing.assert_array_equal(out, ref)  # cold (miss) path
        out2 = native.decode_resize2_crop_batch(
            [p], np.array([[w, h]], dtype=np.int32), out_h=h, out_w=w, crops=[(0, 0)]
        )[0]
        np.testing.assert_array_equal(out2, ref)  # warm (hit) path
