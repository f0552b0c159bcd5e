import numpy as np
import pytest

from bdvcil_tpu.data import (
    BackgroundMixDataset,
    DataLoader,
    RawframeDataset,
    bg_extraction_tmf,
    build_dataset,
)
from tests.synthetic import make_rawframe_tree

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def _train_pipeline(with_randaug=False, randaug_prob=0.75):
    p = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=4),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
    ]
    if with_randaug:
        p.append(dict(type="RandAugment", n=2, m=10, prob=randaug_prob))
    p += [
        dict(type="Resize", scale=(56, 56), keep_ratio=False),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"] + (["randAug"] if with_randaug else []), meta_keys=[]),
        dict(type="ToTensor", keys=["imgs", "label"]),
    ]
    return p


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return make_rawframe_tree(root, num_classes=3, videos_per_class=3, num_frames=8, size=(70, 92))


def test_rawframe_dataset_basic(tree):
    frames_root, train_ann, _ = tree
    ds = RawframeDataset(str(train_ann), _train_pipeline(), data_prefix=str(frames_root))
    assert len(ds) == 6
    sample = ds[0]
    assert sample["imgs"].shape == (4, 56, 56, 3)
    assert sample["label"].shape == (1,)


def test_rawframe_dataset_deterministic_per_epoch(tree):
    frames_root, train_ann, _ = tree
    ds = RawframeDataset(str(train_ann), _train_pipeline(), data_prefix=str(frames_root), seed=3)
    a = ds[0]["imgs"]
    b = ds[0]["imgs"]
    np.testing.assert_array_equal(a, b)  # same epoch -> same sample
    ds.set_epoch(1)
    c = ds[0]["imgs"]
    assert not np.array_equal(a, c)  # new epoch -> new augmentation draw


def test_bg_extraction_tmf(tree, tmp_path):
    frames_root, _, _ = tree
    vdir = frames_root / "video_c0_v0"
    dest = tmp_path / "bg.jpg"
    median = bg_extraction_tmf(vdir, dest)
    assert dest.exists()
    assert median.shape == (70, 92, 3)


def test_bgmix_blends_with_prob_one(tree, tmp_path):
    frames_root, train_ann, _ = tree
    bg_dir = tmp_path / "bg"
    ds = BackgroundMixDataset(
        str(train_ann),
        _train_pipeline(),
        bg_dir=str(bg_dir),
        extract_bg_if_not_found=True,
        prob=1.0,
        alpha=0.5,
        data_prefix=str(frames_root),
        bg_resize=64,
        bg_crop_size=(56, 56),
    )
    # TMF backgrounds were extracted for every video
    assert len(ds.bg_files) == len(ds)
    sample = ds[0]
    assert sample["bg_idx"] >= 0
    assert sample["imgs"].shape == (4, 56, 56, 3)


def test_bgmix_randaug_mutex(tree, tmp_path):
    frames_root, train_ann, _ = tree
    bg_dir = tmp_path / "bg2"
    ds = BackgroundMixDataset(
        str(train_ann),
        _train_pipeline(with_randaug=True, randaug_prob=0.5),
        bg_dir=str(bg_dir),
        extract_bg_if_not_found=True,
        with_randAug=True,
        data_prefix=str(frames_root),
        bg_resize=64,
        bg_crop_size=(56, 56),
    )
    saw_aug = saw_mix = False
    for epoch in range(6):
        ds.set_epoch(epoch)
        for i in range(len(ds)):
            s = ds[i]
            # XOR: bgmix applied exactly when randAug was not
            assert bool(s["randAug"]) == (s["bg_idx"] == -1)
            saw_aug |= bool(s["randAug"])
            saw_mix |= s["bg_idx"] != -1
    assert saw_aug and saw_mix


def test_build_dataset_from_config(tree):
    frames_root, train_ann, _ = tree
    cfg = dict(
        type="RawframeDataset",
        ann_file=str(train_ann),
        pipeline=_train_pipeline(),
        data_prefix=str(frames_root),
    )
    ds = build_dataset(cfg)
    assert isinstance(ds, RawframeDataset)
    assert len(ds) == 6


def test_empty_dataset_constructor(tmp_path):
    ds = RawframeDataset("", _train_pipeline(), data_prefix=str(tmp_path))
    assert len(ds) == 0


def test_dataloader_batches(tree):
    frames_root, train_ann, _ = tree
    ds = RawframeDataset(str(train_ann), _train_pipeline(), data_prefix=str(frames_root))
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["imgs"].shape == (4, 4, 56, 56, 3)
    assert batches[0]["label"].shape == (4, 1)
    assert batches[1]["imgs"].shape[0] == 2  # remainder batch


def test_dataloader_shuffle_reproducible(tree):
    frames_root, train_ann, _ = tree
    ds = RawframeDataset(str(train_ann), _train_pipeline(), data_prefix=str(frames_root))
    l1 = DataLoader(ds, batch_size=6, shuffle=True, seed=11)
    l2 = DataLoader(ds, batch_size=6, shuffle=True, seed=11)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_dataloader_pad_to_batch(tree):
    frames_root, train_ann, _ = tree
    ds = RawframeDataset(str(train_ann), _train_pipeline(), data_prefix=str(frames_root))
    loader = DataLoader(ds, batch_size=4, shuffle=False, pad_to_batch=True)
    batches = list(loader)
    assert len(batches) == 2
    # full batch has no zero weights; padded tail masks the wrapped rows
    np.testing.assert_array_equal(batches[0]["sample_weight"], np.ones(4, np.float32))
    assert batches[1]["imgs"].shape[0] == 4
    np.testing.assert_array_equal(batches[1]["sample_weight"], [1, 1, 0, 0])


def test_dataloader_pad_tiny_dataset(tree):
    frames_root, train_ann, _ = tree
    ds = RawframeDataset(str(train_ann), _train_pipeline(), data_prefix=str(frames_root))
    loader = DataLoader(ds, batch_size=16, shuffle=False, pad_to_batch=True)  # 6 videos
    (batch,) = list(loader)
    assert batch["imgs"].shape[0] == 16
    assert batch["sample_weight"].sum() == 6


def test_predefined_background_mode(tree, tmp_path):
    """Curated background dirs: map_bg_to_video=False globs the whole dir and
    extract_bg_if_not_found=False never runs TMF (predefined_background
    config family)."""
    import cv2

    frames_root, train_ann, _ = tree
    bg_dir = tmp_path / "curated_bg"
    bg_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(bg_dir / f"scene_{i}.jpg"), rng.integers(0, 255, (64, 80, 3)).astype(np.uint8))

    ds = BackgroundMixDataset(
        str(train_ann),
        _train_pipeline(),
        bg_dir=str(bg_dir),
        extract_bg_if_not_found=False,
        map_bg_to_video=False,
        prob=1.0,
        data_prefix=str(frames_root),
        bg_resize=64,
        bg_crop_size=(56, 56),
    )
    assert len(ds.bg_files) == 3  # globbed, not per-video
    s = ds[0]
    assert 0 <= s["bg_idx"] < 3
