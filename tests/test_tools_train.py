"""Smoke test of the single-task trainer (tools/train.py — the reference's
plain mmaction2 path, SURVEY.md §3.5) on synthetic data."""

import sys

import pytest

from tests.synthetic import make_rawframe_tree

T = 4
MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


@pytest.mark.slow
def test_tools_train_single_task(tmp_path, monkeypatch):
    frames_root, train_ann, val_ann = make_rawframe_tree(
        tmp_path, num_classes=2, videos_per_class=5, num_frames=8, size=(70, 92)
    )
    pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="Resize", scale=(56, 56), keep_ratio=False),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs", "label"]),
    ]
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        f"""
videos_per_gpu = 1
workers_per_gpu = 2
total_epochs = 1
seed = 0
work_dir = {str(tmp_path / 'work')!r}
model = dict(
    type='CILRecognizer2D',
    backbone=dict(type='ResNetTSM', depth=18, num_segments={T}, shift_div=8),
    cls_head=dict(
        type='IncrementalTSMHead', num_classes=2, in_channels=512,
        inc_head_config=dict(type='SimpleLinear', out_features=2),
        num_segments={T}, loss_cls=dict(type='CrossEntropyLoss'), dropout_ratio=0.5),
    test_cfg=dict(average_clips='prob'))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4,
                 paramwise_cfg=dict(fc_lr_scale_factor=5.0))
lr_scheduler = dict(type='MultiStepLR', params=dict(milestones=[20], gamma=0.1))
data = dict(
    train=dict(type='RawframeDataset', ann_file={str(train_ann)!r},
               data_prefix={str(frames_root)!r}, pipeline={pipeline!r}),
    val=dict(type='RawframeDataset', ann_file={str(val_ann)!r},
             data_prefix={str(frames_root)!r}, pipeline={pipeline!r}, test_mode=True),
)
"""
    )
    import tools.train as tools_train

    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_file)])
    tools_train.main()

    work = tmp_path / "work"
    assert (work / "final.msgpack").exists()
    assert (work / "latest.msgpack").exists()
    assert (work / "config.py").exists()
    assert (work / "metrics.jsonl").exists()
