import numpy as np
import pytest

from bdvcil_tpu.data.transforms import (
    CenterCrop,
    Collect,
    Compose,
    FiveCrop,
    Flip,
    FormatShape,
    MultiScaleCrop,
    Normalize,
    Resize,
    TenCrop,
    ThreeCrop,
    ToTensor,
)


def _clip(n=3, h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "imgs": [rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8) for _ in range(n)],
        "img_shape": (h, w),
        "modality": "RGB",
        "rng": np.random.default_rng(123),
    }


def test_resize_short_side():
    r = Resize(scale=(-1, 256))
    out = r(_clip(h=240, w=320))
    # short side 240 -> 256; 320 * (256/240) = 341.33 -> int(341.33+0.5)=341
    assert out["img_shape"] == (256, 341)
    assert out["imgs"][0].shape == (256, 341, 3)


def test_resize_exact():
    r = Resize(scale=(224, 224), keep_ratio=False)
    out = r(_clip())
    assert out["img_shape"] == (224, 224)


def test_center_crop():
    out = CenterCrop(224)(_clip(h=256, w=341))
    assert out["img_shape"] == (224, 224)
    assert out["crop_bbox"].tolist() == [58, 16, 282, 240]


def test_ten_crop_count_and_flip():
    clip = _clip(n=2, h=256, w=341)
    out = TenCrop(256)(clip)
    # 5 positions x (orig + flip) x 2 frames = 20 images
    assert len(out["imgs"]) == 20
    assert out["imgs"][0].shape == (256, 256, 3)
    # frames 0..1 are the crop, 2..3 its horizontal flip
    assert np.array_equal(out["imgs"][2], np.flip(out["imgs"][0], axis=1))


def test_five_and_three_crop():
    out = FiveCrop(224)(_clip(n=2, h=256, w=341))
    assert len(out["imgs"]) == 10
    out = ThreeCrop(256)(_clip(n=2, h=256, w=341))
    assert len(out["imgs"]) == 6


def test_multi_scale_crop_sizes():
    clip = _clip(h=256, w=341)
    out = MultiScaleCrop(
        input_size=224,
        scales=(1, 0.875, 0.75, 0.66),
        random_crop=False,
        max_wh_scale_gap=1,
        num_fixed_crops=13,
    )(clip)
    ch, cw = out["img_shape"]
    valid = {224, int(256 * 0.875), int(256 * 0.75), int(256 * 0.66), 256}
    assert ch in valid and cw in valid
    assert out["imgs"][0].shape[:2] == (ch, cw)


def test_flip_consistent_across_frames():
    clip = _clip(n=4)
    orig = [img.copy() for img in clip["imgs"]]
    out = Flip(flip_ratio=1.0)(clip)
    for before, after in zip(orig, out["imgs"]):
        assert np.array_equal(after, np.flip(before, axis=1))


def test_normalize():
    mean = [123.675, 116.28, 103.53]
    std = [58.395, 57.12, 57.375]
    clip = _clip(n=1)
    raw = clip["imgs"][0].astype(np.float32)
    out = Normalize(mean, std)(clip)
    expected = (raw - np.array(mean, np.float32)) / np.array(std, np.float32)
    np.testing.assert_allclose(out["imgs"][0], expected, rtol=1e-6)


def test_format_shape_nchw_nhwc():
    clip = _clip(n=3, h=224, w=224)
    out = FormatShape("NCHW")({**clip, "imgs": [i.astype(np.float32) for i in clip["imgs"]]})
    assert out["imgs"].shape == (3, 3, 224, 224)
    clip = _clip(n=3, h=224, w=224)
    out = FormatShape("NHWC")({**clip, "imgs": [i.astype(np.float32) for i in clip["imgs"]]})
    assert out["imgs"].shape == (3, 224, 224, 3)


def test_collect_and_totensor_label_shape():
    results = {"imgs": np.zeros((3, 224, 224, 3), np.float32), "label": 7, "randAug": True, "junk": 1}
    out = Collect(keys=["imgs", "label", "randAug"])(results)
    assert "junk" not in out
    out = ToTensor(keys=["imgs", "label"])(out)
    assert out["label"].shape == (1,) and out["label"].dtype == np.int64


def test_full_val_pipeline_shapes(tmp_path):
    from tests.synthetic import make_rawframe_tree
    from bdvcil_tpu.data.sampling import SampleFrames  # noqa: F401 (registered)

    frames_root, train_ann, _ = make_rawframe_tree(tmp_path, num_classes=1, videos_per_class=2, num_frames=12, size=(68, 90))
    pipeline = Compose(
        [
            dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=8, test_mode=True),
            dict(type="RawFrameDecode"),
            dict(type="Resize", scale=(-1, 64)),
            dict(type="CenterCrop", crop_size=56),
            dict(type="Normalize", mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
            dict(type="FormatShape", input_format="NHWC"),
            dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
            dict(type="ToTensor", keys=["imgs"]),
        ]
    )
    results = {
        "frame_dir": str(frames_root / "video_c0_v0"),
        "total_frames": 12,
        "label": 0,
        "filename_tmpl": "img_{:05}.jpg",
        "modality": "RGB",
        "start_index": 1,
        "rng": np.random.default_rng(0),
    }
    out = pipeline(results)
    assert out["imgs"].shape == (8, 56, 56, 3)
    assert out["imgs"].dtype == np.float32


def test_random_crop_and_random_resized_crop():
    from bdvcil_tpu.data.transforms import RandomCrop, RandomResizedCrop

    clip = _clip(h=256, w=341)
    out = RandomCrop(224)(clip)
    assert out["img_shape"] == (224, 224)
    x0, y0, x1, y1 = out["crop_bbox"]
    assert 0 <= x0 and x1 <= 341 and 0 <= y0 and y1 <= 256

    clip = _clip(h=256, w=341)
    out = RandomResizedCrop()(clip)
    ch, cw = out["img_shape"]
    assert 0 < ch <= 256 and 0 < cw <= 341
    assert out["imgs"][0].shape[:2] == (ch, cw)


def test_mutex_pipelines_first_firing_wins(capsys):
    """MutexPipelines: first sub-pipeline whose prob fires wins; none firing
    passes results through; PrintPipelines is a pure pass-through printer
    (reference libs/pipelines/mutex.py:7-38)."""
    from bdvcil_tpu.data.transforms import MutexPipelines, PrintPipelines

    a = [dict(type="PrintPipelines", message="A")]
    b = [dict(type="PrintPipelines", message="B")]

    # prob 1 on the first: always A, never B
    mux = MutexPipelines(mutex_pipelines=[a, b], probs=[1.0, 1.0])
    out = mux({"imgs": [np.zeros((4, 4, 3), np.uint8)]})
    assert "imgs" in out
    assert capsys.readouterr().out == "A\n"

    # first never fires, second always: B
    mux = MutexPipelines(mutex_pipelines=[a, b], probs=[0.0, 1.0])
    mux({"imgs": [np.zeros((4, 4, 3), np.uint8)]})
    assert capsys.readouterr().out == "B\n"

    # none fire: unchanged pass-through, nothing printed
    mux = MutexPipelines(mutex_pipelines=[a, b], probs=[0.0, 0.0])
    res = {"marker": 7}
    assert mux(res) is res
    assert capsys.readouterr().out == ""

    with pytest.raises(ValueError):
        MutexPipelines(mutex_pipelines=[a], probs=[0.5, 0.5])
