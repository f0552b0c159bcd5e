"""Smoke tests for the offline prep CLI tools (reference cil_tools/
create_annotation_files.py, extract_background.py, extract_features.py)
and the MetricLogger — the last untested first-party surfaces."""

import json
import sys

import numpy as np
import pytest

from tests.synthetic import make_rawframe_tree

T = 2
MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("offline_tools")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=4, videos_per_class=2, num_frames=6, size=(64, 80)
    )
    return root, frames_root, train_ann, val_ann


def test_create_annotation_files_cli(tree, tmp_path, monkeypatch):
    root, frames_root, train_ann, val_ann = tree
    splits_cfg = tmp_path / "splits.py"
    splits_cfg.write_text("task_splits = [[0, 1], [2], [3]]\n")
    dest = tmp_path / "task_splits"

    import cil_tools.create_annotation_files as tool

    monkeypatch.setattr(sys, "argv", [
        "create_annotation_files.py",
        "--train_ann_file", str(train_ann),
        "--val_ann_file", str(val_ann),
        "--destination", str(dest),
        "--task_splits_config", str(splits_cfg),
    ])
    tool.main()

    # per-task files with remapped incremental labels
    t0 = (dest / "train_task_0.txt").read_text().strip().splitlines()
    assert len(t0) == 2  # classes {0,1} x 1 train video each
    assert {line.split()[-1] for line in t0} == {"0", "1"}
    t2 = (dest / "train_task_2.txt").read_text().strip().splitlines()
    assert [line.split()[-1] for line in t2] == ["3"]  # class 3 -> inc idx 3

    # oracle (cumulative) files: task i holds classes 0..last-of-task-i
    oracle1 = (dest / "val_oracle_task_1.txt").read_text().strip().splitlines()
    assert {line.split()[-1] for line in oracle1} == {"0", "1", "2"}

    mapping = json.loads((dest / "class_indices_mapping.json").read_text())
    assert mapping == {"0": 0, "1": 1, "2": 2, "3": 3}


def test_extract_background_cli(tree, tmp_path, monkeypatch):
    root, frames_root, train_ann, val_ann = tree
    out_dir = tmp_path / "bg"

    import cil_tools.extract_background as tool

    monkeypatch.setattr(sys, "argv", [
        "extract_background.py",
        "--video_dir", str(frames_root),
        "--output_dir", str(out_dir),
        "--num_workers", "2",
        "--method", "tmf",
    ])
    tool.main()

    import cv2

    bgs = sorted(out_dir.glob("*.jpg"))
    assert len(bgs) == 8  # one background per video dir
    img = cv2.imread(str(bgs[0]))
    assert img.shape == (64, 80, 3)

    # skip-existing resume: second run extracts nothing new (reference :119-125)
    before = {p: p.stat().st_mtime for p in bgs}
    tool.main()
    after = {p: p.stat().st_mtime for p in sorted(out_dir.glob("*.jpg"))}
    assert before == after


def test_extract_features_cli(tree, tmp_path, monkeypatch):
    """End to end on a fresh-init checkpoint: correct-only JSON dump with
    per-class features + classifier weights (reference extract_features.py:16-96)."""
    import jax

    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.runtime import save_checkpoint

    root, frames_root, train_ann, val_ann = tree
    work = tmp_path / "work"
    work.mkdir()

    val_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="CenterCrop", crop_size=56),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    cfg_text = f"""
model = dict(
    type="CILRecognizer2D",
    backbone=dict(type="ResNetTSM", depth=18, num_segments={T}, shift_div=8),
    cls_head=dict(
        type="IncrementalTSMHead", num_classes=4, in_channels=512,
        inc_head_config=dict(type="SimpleLinear", out_features=4),
        num_segments={T}, loss_cls=dict(type="CrossEntropyLoss"), dropout_ratio=0.5,
    ),
    test_cfg=dict(average_clips="prob"),
)
data = dict(
    train=dict(type="RawframeDataset", ann_file="{train_ann}",
               data_prefix="{frames_root}", pipeline={val_pipeline!r}),
    val=dict(type="RawframeDataset", ann_file="{val_ann}",
             data_prefix="{frames_root}", pipeline={val_pipeline!r}, test_mode=True),
)
"""
    (work / "config.py").write_text(cfg_text)

    from bdvcil_tpu.config import Config

    spec = build_model(Config.fromfile(str(work / "config.py")).model)
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 56, 56, 3))
    save_checkpoint(work / "latest.msgpack", variables)

    import cil_tools.extract_features as tool

    monkeypatch.setattr(sys, "argv", [
        "extract_features.py", str(work), "--batch_size", "4",
    ])
    tool.main()

    data = json.loads((work / "features" / "out.json").read_text())
    assert "features_by_class" in data and "model_weights" in data
    assert np.asarray(data["model_weights"]).shape == (4, 512)
    # only correctly-classified samples are kept; every kept entry carries
    # the score vector and the consensus representation
    for cls, entries in data["features_by_class"].items():
        for e in entries:
            assert int(np.argmax(e["cls_score"])) == int(cls) == e["label"]
            assert len(e["repr_consensus"]) == 512


def test_metric_logger_jsonl(tmp_path):
    from bdvcil_tpu.utils.logging import MetricLogger

    logger = MetricLogger(work_dir=str(tmp_path))
    logger.log({"loss": 1.5})
    logger.log({"loss": np.float32(0.5)}, step=10)
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["step"] == 10 and lines[1]["loss"] == 0.5


def test_type_b_and_c_bg_cli(tmp_path, monkeypatch):
    """Person-free background curation with precomputed detections
    (reference cil_tools/type_b_and_c_bg.py:23-57)."""
    import cv2

    img_dir = tmp_path / "candidates"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("clean.jpg", "person.jpg", "lowscore.jpg"):
        cv2.imwrite(str(img_dir / name), rng.integers(0, 255, (32, 40, 3)).astype(np.uint8))
    dets = {
        str(img_dir / "person.jpg"): [[1, 1, 10, 10, 0.9, 0]],   # person, confident
        str(img_dir / "lowscore.jpg"): [[1, 1, 10, 10, 0.1, 0]],  # below threshold
    }
    det_json = tmp_path / "dets.json"
    det_json.write_text(json.dumps(dets))
    out_dir = tmp_path / "curated"

    import cil_tools.type_b_and_c_bg as tool

    monkeypatch.setattr(sys, "argv", [
        "type_b_and_c_bg.py", "-i", str(img_dir), "-o", str(out_dir),
        "--detections", str(det_json),
    ])
    tool.main()
    assert sorted(p.name for p in out_dir.iterdir()) == ["clean.jpg", "lowscore.jpg"]


def test_predict_cli(tree, tmp_path, monkeypatch):
    """Serving surface: classify unlabeled rawframe dirs with a checkpoint
    (cil_tools/predict.py — capability the reference lacks)."""
    import jax

    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.runtime import save_checkpoint

    root, frames_root, train_ann, val_ann = tree
    work = tmp_path / "work"
    work.mkdir()

    val_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="CenterCrop", crop_size=56),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    cfg_text = f"""
model = dict(
    type="CILRecognizer2D",
    backbone=dict(type="ResNetTSM", depth=18, num_segments={T}, shift_div=8),
    cls_head=dict(
        type="IncrementalTSMHead", num_classes=4, in_channels=512,
        inc_head_config=dict(type="SimpleLinear", out_features=4),
        num_segments={T}, loss_cls=dict(type="CrossEntropyLoss"), dropout_ratio=0.5,
    ),
    test_cfg=dict(average_clips="prob"),
)
data = dict(
    test=dict(type="RawframeDataset", ann_file="{val_ann}",
              data_prefix="{frames_root}", pipeline={val_pipeline!r}, test_mode=True),
)
"""
    (work / "config.py").write_text(cfg_text)

    from bdvcil_tpu.config import Config

    spec = build_model(Config.fromfile(str(work / "config.py")).model)
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 56, 56, 3))
    save_checkpoint(work / "ckpt.msgpack", variables)
    # original->incremental mapping enables original_label reporting
    (work / "class_indices_mapping.json").write_text(
        json.dumps({"orig_a": 0, "orig_b": 1, "orig_c": 2, "orig_d": 3})
    )

    import cil_tools.predict as tool

    out = tmp_path / "preds.json"
    monkeypatch.setattr(sys, "argv", [
        "predict.py", str(work / "config.py"), str(work / "ckpt.msgpack"),
        str(frames_root), "--output", str(out), "--topk", "2", "--batch_size", "4",
    ])
    tool.main()

    preds = json.loads(out.read_text())["predictions"]
    assert len(preds) == 8  # every video dir under the tree
    for p in preds:
        assert len(p["topk"]) == 2
        scores = [e["score"] for e in p["topk"]]
        assert scores == sorted(scores, reverse=True)
        assert p["topk"][0]["original_label"].startswith("orig_")
    # single-video-dir form
    one = sorted(d for d in frames_root.iterdir() if d.is_dir())[0]
    monkeypatch.setattr(sys, "argv", [
        "predict.py", str(work / "config.py"), str(work / "ckpt.msgpack"),
        str(one), "--topk", "1",
    ])
    tool.main()


def test_predict_discover_ignores_stray_images(tree, tmp_path):
    """Frame counting probes the filename template: a stray non-frame jpg
    must not inflate total_frames (it would point SampleFrames at a
    nonexistent index)."""
    from cil_tools.predict import discover_videos

    root, frames_root, _, _ = tree
    one = sorted(d for d in frames_root.iterdir() if d.is_dir())[0]
    n_before = {name: n for name, d, n, start in discover_videos(frames_root, "img_{:05}.jpg")}
    (one / "preview.jpg").write_bytes(b"\xff\xd8\xff\xd9")  # stray file
    try:
        after = {name: n for name, d, n, start in discover_videos(frames_root, "img_{:05}.jpg")}
        assert after == n_before
    finally:
        (one / "preview.jpg").unlink()


def test_predict_discover_zero_based_layout(tmp_path):
    """0-based rawframe layouts (img_00000.jpg first) must count every frame
    and report start_index=0 so frame 0 is sampled (ADVICE round-2:
    hardcoding start 1 undercounted by one and never read frame 0)."""
    import numpy as np
    import cv2

    from cil_tools.predict import discover_videos

    root = tmp_path / "frames"
    for name, start, n in (("v0", 0, 6), ("v1", 1, 4)):  # mixed layouts
        d = root / name
        d.mkdir(parents=True)
        for i in range(start, start + n):
            cv2.imwrite(str(d / f"img_{i:05}.jpg"),
                        np.full((8, 8, 3), i, np.uint8))
    found = {name: (n, s) for name, d, n, s in discover_videos(root, "img_{:05}.jpg")}
    assert found == {"v0": (6, 0), "v1": (4, 1)}
