#!/usr/bin/env python
"""Full-orchestration CIL demo on real TPU hardware.

Runs the complete framework — CILTrainer task loop, fast C++/device input
path, herding exemplars, per-task checkpoints, CNN+NME testing — on the
flagship TSM-R50 8x224^2 config over a synthetic UCF-shaped rawframe tree.
This complements bench.py (which times the isolated step / train phase):
here the entire product surface executes on the chip.

    python tools/tpu_e2e_demo.py [--classes 12] [--videos 4] [--epochs 1]

Prints one JSON summary line at the end. Synthetic data lives in
/tmp/bdvc_tpu_demo (reused across runs).
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def make_config(root, frames_root, train_ann, val_ann, work_dir, args):
    from bdvcil_tpu.config import Config

    T = 8
    nc0 = args.classes // 2
    train_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="RandAugment", n=2, m=10, prob=0.75),
        dict(type="MultiScaleCrop", input_size=224, scales=(1, 0.875, 0.75, 0.66),
             random_crop=False, max_wh_scale_gap=1, num_fixed_crops=13),
        dict(type="Resize", scale=(224, 224), keep_ratio=False),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label", "randAug"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs", "label"]),
    ]
    val_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    ds = lambda pipeline, **kw: dict(
        type="BackgroundMixDataset", ann_file="", bg_dir=str(root / "bg"),
        data_prefix=str(frames_root), pipeline=pipeline, bg_resize=256,
        bg_crop_size=(224, 224), **kw,
    )
    task0 = list(range(nc0))
    task1 = list(range(nc0, args.classes))
    if args.method == "base":
        head = dict(type="LocalSimilarityClassifier", out_features=nc0, nb_proxies=1)
        loss = dict(type="LSCLoss")
        avg = "prob"
    else:  # iCaRL families: SimpleLinear + CE, score averaging (icarl.py:34)
        head = dict(type="SimpleLinear", out_features=nc0)
        loss = dict(type="CrossEntropyLoss")
        avg = "score"
    cfg = dict(
        work_dir=str(work_dir),
        videos_per_gpu=16,
        workers_per_gpu=2,
        accumulate_grad_batches=1,
        testing_videos_per_gpu=8,
        testing_workers_per_gpu=2,
        task_splits=[task0, task1],
        methods=args.method,
        video_mix_prob=0.5,
        video_mix_alpha=1.0,
        starting_task=0,
        ending_task=1,
        use_cbf=False,
        cbf_train_backbone=False,
        budget_size=2,
        storing_methods="videos",
        budget_type="class",
        num_epochs_per_task=args.epochs,
        cbf_num_epochs_per_task=1,
        save_best=False,
        log_every_n_steps=2,
        keep_all_backgrounds=False,
        cbf_full_bg=False,
        use_fast_input_pipeline=True,
        randAug_prob=0.75,
        compute_dtype="bfloat16",
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=50, num_segments=8, shift_div=8,
                          norm_eval=False),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=nc0,
                in_channels=2048,
                inc_head_config=head,
                num_segments=8,
                loss_cls=loss,
                dropout_ratio=0.5,
            ),
            test_cfg=dict(average_clips=avg),
        ),
        kd_modules_names=["backbone.layer1", "backbone.layer2", "backbone.layer3",
                          "backbone.layer4", "cls_head.avg_pool"],
        kd_weight_by_module=[0.1, 0.1, 0.1, 0.1, 0.1],
        kd_exemplar_only=False,
        adaptive_scale_factors=[1.0, 1.5],
        optimizer=dict(
            type="SGD", constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=5.0),
            lr=0.02, momentum=0.9, weight_decay=1e-4,
        ),
        lr_scheduler=dict(type="MultiStepLR", params=dict(milestones=[20], gamma=0.1)),
        cbf_optimizer=dict(
            type="SGD", constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=1.0),
            lr=0.01, momentum=0.9, weight_decay=1e-4,
        ),
        cbf_lr_scheduler=dict(type="MultiStepLR", params=dict(milestones=[20], gamma=0.1)),
        data_root=str(frames_root),
        train_ann_file=str(train_ann),
        val_ann_file=str(val_ann),
        cil_ann_file_template="{}_task_{}.txt",
        data=dict(
            train=ds(train_pipeline, alpha=0.5, with_randAug=True),
            val=ds(val_pipeline, test_mode=True),
            test=ds(val_pipeline, test_mode=True),
            features_extraction=ds(val_pipeline, test_mode=True),
            features_extraction_epochs=1,
            exemplar=ds(train_pipeline, alpha=0.5, with_randAug=True),
        ),
        seed=0,
    )
    return Config.fromdict(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=12)
    ap.add_argument("--videos", type=int, default=4, help="videos per class")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--method", default="base",
                    choices=["base", "icarl", "icarl_video_mix"])
    args = ap.parse_args()

    from tests.synthetic import make_rawframe_tree
    from bdvcil_tpu.data.datasets import bg_extraction_tmf

    root = pathlib.Path("/tmp/bdvc_tpu_demo")
    marker = root / f".ok_{args.classes}_{args.videos}"
    if not marker.exists():
        frames_root, train_ann, val_ann = make_rawframe_tree(
            root, num_classes=args.classes, videos_per_class=args.videos,
            num_frames=16, size=(240, 320),
        )
        bg_dir = root / "bg"
        bg_dir.mkdir(exist_ok=True)
        for vdir in sorted(frames_root.iterdir()):
            bg_extraction_tmf(vdir, bg_dir / f"{vdir.name}.jpg")
        marker.touch()
    frames_root = root / "rawframes"
    train_ann, val_ann = root / "train_ann.txt", root / "val_ann.txt"

    import shutil
    work_dir = root / "work"
    shutil.rmtree(work_dir, ignore_errors=True)

    from bdvcil_tpu.cil import CILTrainer

    cfg = make_config(root, frames_root, train_ann, val_ann, work_dir, args)
    t0 = time.perf_counter()
    trainer = CILTrainer(cfg)
    trainer.train()
    dt = time.perf_counter() - t0

    import jax

    ckpts = sorted(str(p.name) for p in (work_dir / "ckpt").glob("ckpt_task_*.msgpack"))
    print(json.dumps({
        "demo": "full CIL orchestration on TPU (TSM-R50 8x224, fast input path)",
        "method": args.method,
        "platform": jax.devices()[0].platform,
        "tasks": 2,
        "wall_s": round(dt, 1),
        "checkpoints": ckpts,
    }))


if __name__ == "__main__":
    main()
