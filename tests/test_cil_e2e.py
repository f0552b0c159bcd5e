"""End-to-end CIL integration on a synthetic rawframe tree: 3 tasks over the
full 8-device CPU mesh, herding exemplars, per-task checkpoints, CNN+NME
testing, resume, and full-protocol cil_testing."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute full-protocol runs

from bdvcil_tpu.config import Config
from bdvcil_tpu.cil import CILTrainer
from tests.synthetic import make_rawframe_tree

T = 4
MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def make_cil_config(root, frames_root, train_ann, val_ann, work_dir, **overrides):
    train_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="RandAugment", n=2, m=10, prob=0.5),
        dict(type="MultiScaleCrop", input_size=56, scales=(1, 0.875), random_crop=False,
             max_wh_scale_gap=1, num_fixed_crops=13),
        dict(type="Resize", scale=(56, 56), keep_ratio=False),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label", "randAug"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs", "label"]),
    ]
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
    bg_dir = str(root / "bg")
    ds = lambda pipeline, **kw: dict(
        type="BackgroundMixDataset",
        ann_file="",
        bg_dir=bg_dir,
        data_prefix=str(frames_root),
        pipeline=pipeline,
        bg_resize=64,
        bg_crop_size=(56, 56),
        **kw,
    )
    cfg = dict(
        work_dir=str(work_dir),
        videos_per_gpu=1,  # global batch = 1 x 8-device test mesh
        workers_per_gpu=2,
        accumulate_grad_batches=1,
        testing_videos_per_gpu=8,
        testing_workers_per_gpu=2,
        task_splits=[[0, 1], [2], [3]],
        methods="base",
        starting_task=0,
        ending_task=2,
        use_cbf=False,
        cbf_train_backbone=False,
        budget_size=2,
        storing_methods="videos",
        budget_type="class",
        num_epochs_per_task=1,
        cbf_num_epochs_per_task=1,
        save_best=False,
        log_every_n_steps=1,
        keep_all_backgrounds=False,
        cbf_full_bg=False,
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8, norm_eval=False),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=2,
                in_channels=512,
                inc_head_config=dict(type="LocalSimilarityClassifier", out_features=2, nb_proxies=1),
                num_segments=T,
                loss_cls=dict(type="LSCLoss"),
                dropout_ratio=0.5,
            ),
            test_cfg=dict(average_clips="prob"),
        ),
        kd_modules_names=["backbone.layer4", "cls_head.avg_pool"],
        kd_weight_by_module=[0.01, 0.01],
        kd_exemplar_only=False,
        adaptive_scale_factors=[1.0, 1.5, 2.0],
        optimizer=dict(
            type="SGD",
            constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=5.0),
            lr=0.02,
            momentum=0.9,
            weight_decay=1e-4,
        ),
        lr_scheduler=dict(type="MultiStepLR", params=dict(milestones=[20], gamma=0.1)),
        cbf_optimizer=dict(
            type="SGD",
            constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=1.0),
            lr=0.01,
            momentum=0.9,
            weight_decay=1e-4,
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
    cfg.update(overrides)
    return Config.fromdict(cfg)


@pytest.fixture(scope="module")
def cil_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cil")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=4, videos_per_class=5, num_frames=8, size=(70, 92)
    )
    return root, frames_root, train_ann, val_ann


def test_full_cil_run_and_protocol(cil_env, tmp_path_factory):
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work")
    cfg = make_cil_config(root, frames_root, train_ann, val_ann, work_dir)
    trainer = CILTrainer(cfg)

    # annotation split files exist with remapped labels
    assert (work_dir / "task_splits" / "train_task_0.txt").exists()
    assert (work_dir / "config.py").exists()

    trainer.train()

    # per-task checkpoints + exemplars + class means were produced
    for t in range(3):
        assert (work_dir / "ckpt" / f"ckpt_task_{t}.msgpack").exists()
        assert (work_dir / "exemplar" / f"exemplar_task_{t}.txt").exists()
        assert (work_dir / "ckpt" / f"exemplar_class_mean_task_{t}.npz").exists()

    # exemplar sizes: budget 2 per class
    ex0 = (work_dir / "exemplar" / "exemplar_task_0.txt").read_text().strip().splitlines()
    assert len(ex0) == 4  # 2 classes x budget 2
    ex1 = (work_dir / "exemplar" / "exemplar_task_1.txt").read_text().strip().splitlines()
    assert len(ex1) == 2

    # class means shapes follow classifier growth
    cm2 = np.load(work_dir / "ckpt" / "exemplar_class_mean_task_2.npz")["class_means"]
    assert cm2.shape == (4, 512)

    # classifier grew to 4 classes by the last task
    assert trainer.variables["params"]["head"]["fc_weights"].shape[0] == 4

    # full-protocol testing over saved checkpoints
    trainer2 = CILTrainer(cfg, dump_config=False)
    trainer2.cil_testing(test_nme=True)
    assert (work_dir / "cnn_result.txt").exists()
    assert (work_dir / "nme_result.txt").exists()
    table = (work_dir / "cnn_result.txt").read_text()
    assert "task 0" in table and "task 2" in table and "avg_acc" in table

    # single-checkpoint testing at a chosen task (test_single_ckpt path)
    cfg3 = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir, starting_task=1, ending_task=1
    )
    trainer3 = CILTrainer(cfg3, dump_config=False)
    trainer3.single_ckpt_testing(
        str(work_dir / "ckpt" / "ckpt_task_1.msgpack"), test_nme=True
    )


def test_resume_from_task(cil_env, tmp_path_factory):
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_resume")
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir, ending_task=1
    )
    CILTrainer(cfg).train()  # tasks 0..1

    cfg2 = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir, starting_task=2, ending_task=2
    )
    trainer = CILTrainer(cfg2, dump_config=False)
    # resumed state: classifier grown to 4, exemplars collected for 2 tasks
    assert trainer.variables["params"]["head"]["fc_weights"].shape[0] == 4
    assert len(trainer.data_module.exemplar_datasets) == 2
    trainer.train()
    assert (work_dir / "ckpt" / "ckpt_task_2.msgpack").exists()


def test_cil_with_fast_input_pipeline(cil_env, tmp_path_factory):
    """Trainer-integrated fast path: native uint8 decode + device-fused
    RandAugment/bgmix for training, FastEvalLoader for val/feature
    extraction."""
    from bdvcil_tpu.data import native

    if not native.available():
        pytest.skip("native decoder not built")

    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_fast")
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        ending_task=1, use_fast_input_pipeline=True, randAug_prob=0.5,
    )
    trainer = CILTrainer(cfg)
    loader, input_fn = trainer._try_fast_loader()
    assert loader is not None and input_fn is not None
    assert loader.crop_size == 56  # derived from the configured pipeline
    trainer.train()
    for t in range(2):
        assert (work_dir / "ckpt" / f"ckpt_task_{t}.msgpack").exists()
        assert (work_dir / "exemplar" / f"exemplar_task_{t}.txt").exists()


def test_cil_with_cbf_and_save_best(cil_env, tmp_path_factory):
    """CBF phase (frozen backbone over the small exemplar set — exercises the
    padded-batch mask) + save-best validation checkpoints."""
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_cbf")
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        ending_task=1, use_cbf=True, save_best=True,
    )
    trainer = CILTrainer(cfg)
    trainer.train()
    for t in range(2):
        assert (work_dir / "ckpt" / f"ckpt_task_{t}.msgpack").exists()
    # CBF ran on the exemplar-only dataset (4 videos < global batch of 8)
    # and the classifier is still sane after the frozen-backbone fine-tune
    assert trainer.variables["params"]["head"]["fc_weights"].shape[0] == 3


def test_cil_icarl_method_e2e(cil_env, tmp_path_factory):
    """iCaRL soft-target method through the full trainer (SimpleLinear head,
    raw-score averaging, prev-model soft targets at task 1)."""
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_icarl")
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        ending_task=1, methods="icarl",
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=2,
                in_channels=512,
                inc_head_config=dict(type="SimpleLinear", out_features=2),
                num_segments=T,
                loss_cls=dict(type="CrossEntropyLoss"),
                dropout_ratio=0.5,
            ),
            test_cfg=dict(average_clips="prob"),
        ),
    )
    trainer = CILTrainer(cfg)
    assert trainer.spec.average_clips == "score"  # forced for icarl (icarl.py:34)
    trainer.train()
    assert (work_dir / "ckpt" / "ckpt_task_1.msgpack").exists()
    assert trainer.variables["params"]["head"]["fc_weight"].shape[0] == 3


def test_bg_pool_policies_e2e(cil_env, tmp_path_factory):
    """keep_all_backgrounds accumulates bg files across tasks into the train
    set and the CBF dataset uses the accumulated pool (cil.py:146-172,
    190-195); also covers resume's bg-pool restore (cil.py:690-694)."""
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_bgpool")
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        ending_task=1, use_cbf=True, keep_all_backgrounds=True,
    )
    trainer = CILTrainer(cfg)
    trainer.train()

    # at task 1 the train dataset's bg pool includes task 0's backgrounds
    # (task0: 8 train videos, task1: 4 + exemplar replay)
    dm = trainer.data_module
    assert len(dm.all_bg_files) >= 8
    assert set(dm.train_dataset.bg_files) >= dm.all_bg_files or len(
        dm.train_dataset.bg_files
    ) == len(dm.all_bg_files)

    # resume path restores the pool from earlier tasks' datasets
    cfg2 = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        starting_task=1, ending_task=1, use_cbf=True, keep_all_backgrounds=True,
    )
    trainer2 = CILTrainer(cfg2, dump_config=False)
    assert len(trainer2.data_module.all_bg_files) >= 8


def make_acm_cil_config(frames_root, train_ann, val_ann, det_file, work_dir, **overrides):
    """Config dict for the ActorCutMix/iCaRL family (shared by the host-path
    e2e test below and the fast-path test in tests/test_fast_acm.py)."""
    t8 = 8  # the ACM pipelines are hardcoded to 8 segments / 224 crops
    val_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=t8, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 256)),
        dict(type="CenterCrop", crop_size=224),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    acm_ds = dict(
        type="ActorCutMixDataset",
        ann_file="",
        det_file=str(det_file),
        acm_prob=1.0,
        data_prefix=str(frames_root),
        pipeline=[],  # internal pipelines are hardcoded (reference parity)
    )
    raw_ds = dict(
        type="RawframeDataset",
        ann_file="",
        data_prefix=str(frames_root),
        pipeline=val_pipeline,
        test_mode=True,
    )
    cfg = dict(
        det_file=str(det_file),  # top-level like the reference ACM configs
        work_dir=str(work_dir),
        videos_per_gpu=1,
        workers_per_gpu=2,
        accumulate_grad_batches=1,
        testing_videos_per_gpu=8,
        testing_workers_per_gpu=2,
        task_splits=[[0, 1], [2]],
        methods="icarl",
        starting_task=0,
        ending_task=1,
        use_cbf=False,
        cbf_train_backbone=False,
        budget_size=1,
        storing_methods="videos",
        budget_type="class",
        num_epochs_per_task=1,
        cbf_num_epochs_per_task=1,
        save_best=False,
        log_every_n_steps=1,
        keep_all_backgrounds=False,
        cbf_full_bg=False,
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=t8, shift_div=8),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=2,
                in_channels=512,
                inc_head_config=dict(type="SimpleLinear", out_features=2),
                num_segments=t8,
                loss_cls=dict(type="ACMSmoothCE"),
                dropout_ratio=0.5,
            ),
            test_cfg=dict(average_clips="score"),
        ),
        optimizer=dict(
            type="SGD",
            constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=5.0),
            lr=0.01, momentum=0.9, weight_decay=1e-4,
        ),
        lr_scheduler=dict(type="MultiStepLR", params=dict(milestones=[20], gamma=0.1)),
        cbf_optimizer=dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=1e-4),
        cbf_lr_scheduler=dict(type="MultiStepLR", params=dict(milestones=[20], gamma=0.1)),
        data_root=str(frames_root),
        train_ann_file=str(train_ann),
        val_ann_file=str(val_ann),
        cil_ann_file_template="{}_task_{}.txt",
        data=dict(
            train=acm_ds,
            val=raw_ds,
            test=raw_ds,
            features_extraction=raw_ds,
            features_extraction_epochs=1,
            exemplar=acm_ds,
        ),
        seed=0,
    )
    cfg.update(overrides)
    return cfg


def test_cil_actor_cut_mix_icarl_e2e(tmp_path_factory):
    """The reference's ActorCutMix family (configs/ucf101/
    seed_*_ActorCutMix_plus_randAug.py): methods='icarl', SimpleLinear head,
    train ds = ActorCutMixDataset + det_file, eval ds = plain
    RawframeDataset. Exercises foreground_ratio/background_label collation
    through the loader into acm_smooth_targets (icarl.py:103-111)."""
    root = tmp_path_factory.mktemp("acm_cil")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=3, videos_per_class=2, num_frames=10, size=(240, 320)
    )
    dets = {}
    for vdir in frames_root.iterdir():
        per_frame = {}
        for t in range(0, 12):
            per_frame[t] = np.array([[40.0, 30.0, 200.0, 170.0, 0.9]], dtype=np.float32)
        dets[vdir.name] = per_frame
    det_file = root / "dets.npy"
    np.save(det_file, dets, allow_pickle=True)

    work_dir = tmp_path_factory.mktemp("work_acm")
    cfg = Config.fromdict(
        make_acm_cil_config(frames_root, train_ann, val_ann, det_file, work_dir)
    )
    trainer = CILTrainer(cfg)
    assert trainer.spec.average_clips == "score"
    trainer.train()
    assert (work_dir / "ckpt" / "ckpt_task_1.msgpack").exists()
    assert trainer.variables["params"]["head"]["fc_weight"].shape[0] == 3


def test_cil_icarl_video_mix_e2e(cil_env, tmp_path_factory):
    """iCaRL + tube-CutMix through the full trainer (icarl_video_mix.py:19-81):
    on-device tubemix batch augmentation inside the jitted step, soft targets
    at task 1."""
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_vmix")
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        ending_task=1, methods="icarl_video_mix",
        video_mix_prob=1.0, video_mix_alpha=1.0,
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=2,
                in_channels=512,
                inc_head_config=dict(type="SimpleLinear", out_features=2),
                num_segments=T,
                loss_cls=dict(type="CrossEntropyLoss"),
                dropout_ratio=0.5,
            ),
            test_cfg=dict(average_clips="prob"),
        ),
    )
    trainer = CILTrainer(cfg)
    trainer.train()
    assert (work_dir / "ckpt" / "ckpt_task_1.msgpack").exists()
    assert trainer.variables["params"]["head"]["fc_weight"].shape[0] == 3


def test_tencrop_eval_protocol(cil_env, tmp_path_factory):
    """Two-task run whose val/test pipeline is the reference's canonical
    TenCrop (ucf101 config :164) — exercises the multi-crop group eval path
    (10 crops x T segments) through the full trainer + cil_testing."""
    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_tencrop")
    tencrop_val = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="TenCrop", crop_size=56),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs"]),
    ]
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        task_splits=[[0, 1], [2]], ending_task=1,
    )
    for split in ("val", "test", "features_extraction"):
        cfg.data[split].pipeline = tencrop_val
    trainer = CILTrainer(cfg)
    trainer.train()
    for t in range(2):
        assert (work_dir / "ckpt" / f"ckpt_task_{t}.msgpack").exists()
    trainer2 = CILTrainer(cfg, dump_config=False)
    trainer2.cil_testing(test_nme=True)
    assert (work_dir / "cnn_result.txt").exists()
    assert (work_dir / "nme_result.txt").exists()


def test_cil_rawframe_fast_input_video_mix(cil_env, tmp_path_factory):
    """Fast input path for the plain-RawframeDataset train families
    (icarl_video_mix / icarl_noaug, config_templates.py:250-266): the
    reference's CPU chain serves every family equally, so the fast path must
    too. The loader is FastBGMixLoader with an empty background list —
    apply_bgmix must be False on every row, RandAugment fires per prob, and
    the full trainer runs 2 tasks with tubemix inside the jitted step."""
    from bdvcil_tpu.data import native

    if not native.available():
        pytest.skip("native decoder not built")

    root, frames_root, train_ann, val_ann = cil_env
    work_dir = tmp_path_factory.mktemp("work_fast_raw")
    raw_train = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="RandAugment", n=2, m=10, prob=0.5),
        dict(type="MultiScaleCrop", input_size=56, scales=(1, 0.875), random_crop=False,
             max_wh_scale_gap=1, num_fixed_crops=13),
        dict(type="Resize", scale=(56, 56), keep_ratio=False),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label", "randAug"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs", "label"]),
    ]
    raw_ds = lambda pipeline, **kw: dict(
        type="RawframeDataset", ann_file="", data_prefix=str(frames_root),
        pipeline=pipeline, **kw,
    )
    cfg = make_cil_config(
        root, frames_root, train_ann, val_ann, work_dir,
        ending_task=1, use_fast_input_pipeline=True, randAug_prob=0.5,
        methods="icarl_video_mix", video_mix_prob=0.5, video_mix_alpha=1.0,
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=2,
                in_channels=512,
                inc_head_config=dict(type="SimpleLinear", out_features=2),
                num_segments=T,
                loss_cls=dict(type="CrossEntropyLoss"),
                dropout_ratio=0.5,
            ),
            test_cfg=dict(average_clips="prob"),
        ),
    )
    cfg.data["train"] = raw_ds(raw_train)
    cfg.data["exemplar"] = raw_ds(raw_train)
    trainer = CILTrainer(cfg)
    loader, input_fn = trainer._try_fast_loader()
    assert loader is not None and input_fn is not None
    assert loader.bg_files == [] and loader.crop_size == 56
    # every batch: no background blending, randaug per prob draw
    batch = loader._make_batch(np.arange(min(4, len(loader.video_infos))))
    assert not batch["apply_bgmix"].any()
    trainer.train()
    for t in range(2):
        assert (work_dir / "ckpt" / f"ckpt_task_{t}.msgpack").exists()
    assert trainer.variables["params"]["head"]["fc_weight"].shape[0] == 3
