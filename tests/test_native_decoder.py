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
