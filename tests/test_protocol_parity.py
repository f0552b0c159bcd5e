"""Full-protocol torch-vs-jax CIL accuracy parity (the BASELINE.md accuracy
north star, scaled to what this environment allows).

Both sides run the COMPLETE multi-task protocol — per-task training with
feature-KD, herding exemplar selection, exemplar replay, CBF fine-tuning,
NME class means, CNN+NME testing over tasks [0..t] — over the SAME
learnable synthetic rawframe tree with identical data order (both harnesses
build `CILDataModule` from the same config; every loader batch is a pure
function of (seed, epoch, idx)) and identical initial weights (torch init
converted through models/pretrained.load_torch_resnet_backbone):

  * torch side: tests/torch_cil_reference.TorchMiniCIL — the reference's
    loop semantics (cil.py:621-860) in torch
  * jax side:   the real CILTrainer

The final CNN and NME accuracy matrices must agree within a cross-framework
tolerance. Exact trajectories diverge chaotically after ~4 steps (see
test_torch_train_parity), so the comparison is at the level the north star
is stated at: protocol accuracy, not per-step loss.
"""

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from bdvcil_tpu.config import Config

T = 2
CROP = 56
NUM_CLASSES = 6
TASK_SPLITS = [[0, 1], [2, 3], [4, 5]]
MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def make_parity_config(root, frames_root, train_ann, val_ann, work_dir, **overrides):
    train_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="RandAugment", n=2, m=10, prob=0.5),
        dict(type="MultiScaleCrop", input_size=CROP, scales=(1, 0.875), random_crop=False,
             max_wh_scale_gap=1, num_fixed_crops=13),
        dict(type="Resize", scale=(CROP, CROP), keep_ratio=False),
        dict(type="Normalize", mean=MEAN, std=STD),
        dict(type="FormatShape", input_format="NHWC"),
        dict(type="Collect", keys=["imgs", "label", "randAug"], meta_keys=[]),
        dict(type="ToTensor", keys=["imgs", "label"]),
    ]
    val_pipeline = [
        dict(type="SampleFrames", clip_len=1, frame_interval=1, num_clips=T, test_mode=True),
        dict(type="RawFrameDecode"),
        dict(type="Resize", scale=(-1, 64)),
        dict(type="CenterCrop", crop_size=CROP),
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
        bg_crop_size=(CROP, CROP),
        **kw,
    )
    cfg = dict(
        work_dir=str(work_dir),
        videos_per_gpu=1,  # global batch = 1 x 8-device mesh / stub world
        workers_per_gpu=2,
        accumulate_grad_batches=1,
        testing_videos_per_gpu=8,
        testing_workers_per_gpu=2,
        task_splits=TASK_SPLITS,
        methods="base",
        starting_task=0,
        ending_task=2,
        use_cbf=True,
        cbf_train_backbone=False,
        budget_size=3,
        storing_methods="videos",
        budget_type="class",
        num_epochs_per_task=14,
        cbf_num_epochs_per_task=10,
        save_best=False,
        log_every_n_steps=50,
        keep_all_backgrounds=False,
        cbf_full_bg=False,
        model=dict(
            type="CILRecognizer2D",
            backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8,
                          norm_eval=False),
            cls_head=dict(
                type="IncrementalTSMHead",
                num_classes=2,
                in_channels=512,
                inc_head_config=dict(type="LocalSimilarityClassifier", out_features=2,
                                     nb_proxies=1),
                num_segments=T,
                loss_cls=dict(type="LSCLoss"),
                dropout_ratio=0.0,  # cross-framework RNG cannot match
            ),
            test_cfg=dict(average_clips="prob"),
        ),
        kd_modules_names=["backbone.layer4", "cls_head.avg_pool"],
        kd_weight_by_module=[0.1, 0.1],
        kd_exemplar_only=False,
        adaptive_scale_factors=[1.0, 1.225, 1.414],
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


def torch_init_to_variables(model) -> dict:
    """Convert the torch model's INITIAL weights into our variables tree so
    both frameworks start from identical parameters."""
    from bdvcil_tpu.models.pretrained import load_torch_resnet_backbone

    sd = {("backbone." + k): v.clone() for k, v in model.backbone.state_dict().items()}
    bk_params, bk_stats = load_torch_resnet_backbone(sd)
    if getattr(model, "head_type", "lsc") == "linear":
        head = {
            "fc_weight": jnp.asarray(model.fc_weights.detach().numpy().copy()),
            "fc_bias": jnp.asarray(model.fc_bias.detach().numpy().copy()),
        }
    else:
        head = {
            "fc_weights": jnp.asarray(model.fc_weights.detach().numpy().copy()),
            "eta": jnp.asarray(model.eta.detach().numpy().copy()),
        }
    return {
        "params": {"backbone": bk_params, "head": head},
        "batch_stats": {"backbone": bk_stats},
    }


# the tuned discriminative tree, defined ONCE — the fixture below and
# tools/parity_study.py both build from these exact parameters, so the
# studied protocol cannot drift from the tested one
TREE_PARAMS = dict(
    num_classes=NUM_CLASSES, train_videos_per_class=6,
    val_videos_per_class=6, num_frames=8, size=(64, 80), seed=3,
    noise=60, video_jitter=42, palette_lo=85, palette_hi=170,
    val_jitter=80, extra_val_videos_per_class=18,
)

# stage-DEPTH variant: the BASELINE.md north star is stated over a 10-stage
# UCF101 protocol, so beyond per-stage bias (3-stage multi-seed study) the
# parity evidence needs stages-deep error ACCUMULATION checked. 12 classes /
# 6 two-class tasks is the deepest protocol the 27-color palette + mid-band
# tuning supports here; palette spread widened (40/215, 3 levels/channel ->
# ~87/channel spacing, comparable to the base tree's 85) so the 12-way task
# stays learnable at the same jitter/noise difficulty.
DEPTH_STAGES = 6
DEPTH_TREE_PARAMS = dict(
    num_classes=2 * DEPTH_STAGES, train_videos_per_class=6,
    val_videos_per_class=6, num_frames=8, size=(64, 80), seed=3,
    noise=60, video_jitter=42, palette_lo=40, palette_hi=215,
    val_jitter=80, extra_val_videos_per_class=18,
)


def depth_overrides(stages: int = DEPTH_STAGES) -> dict:
    """Config overrides turning the 3-task protocol into a ``stages``-deep
    one (two classes per task, KD scales from the reference formula)."""
    from bdvcil_tpu.protocol import adaptive_scale_factors

    splits = [[2 * t, 2 * t + 1] for t in range(stages)]
    return dict(
        task_splits=splits,
        ending_task=stages - 1,
        adaptive_scale_factors=adaptive_scale_factors(splits),
    )


def build_parity_tree(root, params=None):
    """Build the tuned parity tree + background dir under ``root``.

    Difficulty tuned so BOTH metrics land mid-band at every stage (the
    comparison must be discriminative, not at a 0/100 ceiling): training is
    in the robust regime (14 epochs clears the from-scratch convergence
    cliff) while val videos carry a larger color jitter than train
    (val_jitter) so irreducible val error pins accuracies at ~60-85.
    24 val videos/class (48/stage) put the accuracy quantum at ~2.1 pts —
    fine enough that the parity bounds below measure framework agreement
    rather than per-video quantization noise (the earlier 6/class tree
    forced 8.3-pt steps and a 15-20 pt tolerance). The extra 18/class come
    from an independent RNG stream (extra_val_videos_per_class) so the
    TRAIN tree is bit-identical to the tuned round-3 setup — regrowing the
    whole tree shifts the shared RNG stream and pushed the torch run off
    the from-scratch convergence cliff (stage accuracies 62->13->2)."""
    import cv2

    from tests.synthetic import make_learnable_rawframe_tree

    frames_root, train_ann, val_ann = make_learnable_rawframe_tree(
        root, **(params or TREE_PARAMS)
    )
    # backgrounds for the BackgroundMixDataset pipeline
    bg_dir = root / "bg"
    bg_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(11)
    for i in range(6):
        cv2.imwrite(str(bg_dir / f"bg{i}.jpg"),
                    rng.integers(0, 255, size=(64, 80, 3)).astype(np.uint8))
    return root, frames_root, train_ann, val_ann


def make_icarl_model():
    """The iCaRL-family model dict: SimpleLinear (IncrementalNet) head, CE
    loss. test_cfg says 'prob' ON PURPOSE: the trainer must force 'score'
    for iCaRL methods (trainer.py mirror of icarl.py:34)."""
    return dict(
        type="CILRecognizer2D",
        backbone=dict(type="ResNetTSM", depth=18, num_segments=T, shift_div=8,
                      norm_eval=False),
        cls_head=dict(
            type="IncrementalTSMHead",
            num_classes=2,
            in_channels=512,
            inc_head_config=dict(type="SimpleLinear", out_features=2),
            num_segments=T,
            loss_cls=dict(type="CrossEntropyLoss"),
            dropout_ratio=0.0,  # cross-framework RNG cannot match
        ),
        test_cfg=dict(average_clips="prob"),
    )


def method_overrides(method: str) -> dict:
    """Per-method-family config overrides, shared with tools/parity_study.py.

    iCaRL-family lr/epochs tuned on the torch side so the linear-CE head
    clears the from-scratch convergence cliff (stage-0 CNN 87.5 at 0.01/24;
    at the base config's 0.02/14 it sits at chance, which would make the
    comparison vacuous): probed over {0.01,0.02,0.05,0.1}x{14..30}.
    video_mix hyperparameters are tuned JOINTLY for both frameworks: at
    prob=0.25/epochs=24 the 12-video task sits right on that cliff and the
    jax side's seed-0 tubemix realization tips it to chance (stage-0 CNN
    45.8; seed 7 converges at 70.8, prob=0 at 85.4 — determinism probes,
    not a tubemix bug, its semantics are pinned by
    test_tubemix_torch_mirrors_device_semantics). Swept prob {0.15, 0.25}
    x epochs {24, 32} identically on both sides: prob=0.15/epochs=32 is
    the strongest mixing that converges for both (stage-0 CNN torch 87.5 /
    jax 77.1), so the comparison stays discriminative while still
    exercising tubemix every epoch."""
    if method == "base":
        return {}
    ov = dict(methods=method, model=make_icarl_model(), num_epochs_per_task=24)
    if method == "icarl_video_mix":
        ov.update(video_mix_prob=0.15, video_mix_alpha=1.0,
                  num_epochs_per_task=32)
    return ov


def run_protocol_pair(
    tree, work_torch, work_jax, method="base", timings=None,
    jax_overrides=None, **extra_overrides
):
    """One paired (torch, jax) full-protocol run: same tree, same init, same
    data order. Returns (TorchMiniCIL, CILTrainer) after both trained —
    the single pair-runner shared by every parity test and the study tool
    (tools/parity_study.py). Pass a dict as ``timings`` to receive per-side
    train wall seconds.

    ``jax_overrides`` apply to the jax config ONLY — used by the study
    tool's --platform tpu mode to rescale per-device batch sizes for a
    1-device mesh while the global batch stays 8. TorchMiniCIL hardcodes a
    world_size-8 mirror (torch_cil_reference.py controller stub), so a
    shared videos_per_gpu override would silently change the torch side's
    GLOBAL batch and its training dynamics with it."""
    import time

    from bdvcil_tpu.cil import CILTrainer
    from tests.torch_cil_reference import TorchMiniCIL

    root, frames_root, train_ann, val_ann = tree
    overrides = dict(method_overrides(method), **extra_overrides)
    cfg_torch = make_parity_config(
        root, frames_root, train_ann, val_ann, work_torch, **overrides
    )
    cfg_jax = make_parity_config(
        root, frames_root, train_ann, val_ann, work_jax,
        **dict(overrides, **(jax_overrides or {}))
    )
    if method != "base":
        cfg_torch.optimizer["lr"] = cfg_jax.optimizer["lr"] = 0.01

    mini = TorchMiniCIL(cfg_torch)
    if method != "base":
        assert mini.head_type == "linear" and mini.average_clips == "score"
    init_variables = torch_init_to_variables(mini.model)

    trainer = CILTrainer(cfg_jax)
    trainer.variables = init_variables

    t0 = time.time()
    mini.train()
    t1 = time.time()
    trainer.train()
    if timings is not None:
        timings["wall_torch_s"] = round(t1 - t0, 1)
        timings["wall_jax_s"] = round(time.time() - t1, 1)
    return mini, trainer


@pytest.fixture(scope="module")
def parity_tree(tmp_path_factory):
    return build_parity_tree(tmp_path_factory.mktemp("parity_data"))


def test_full_protocol_accuracy_parity(parity_tree, tmp_path_factory):
    mini, trainer = run_protocol_pair(
        parity_tree,
        tmp_path_factory.mktemp("work_torch"),
        tmp_path_factory.mktemp("work_jax"),
    )

    cnn_t = [np.mean(r) for r in mini.cnn_matrix]
    cnn_j = [np.mean(r) for r in trainer.cnn_matrix]
    nme_t = [np.mean(r) for r in mini.nme_matrix]
    nme_j = [np.mean(r) for r in trainer.nme_matrix]
    print("\ntorch CNN matrix:", mini.cnn_matrix)
    print("jax   CNN matrix:", trainer.cnn_matrix)
    print("torch NME matrix:", mini.nme_matrix)
    print("jax   NME matrix:", trainer.nme_matrix)
    print("per-stage avg CNN torch/jax:", cnn_t, cnn_j)
    print("per-stage avg NME torch/jax:", nme_t, nme_j)

    # the comparison must not be vacuous: every stage average must sit in a
    # discriminative band on BOTH sides (neither floor nor ceiling), so a
    # real protocol bug (broken KD, herding, replay, CBF, NME means) cannot
    # hide behind an always-0 or always-100 metric
    for series in (cnn_t, cnn_j, nme_t, nme_j):
        for v in series:
            assert 30.0 <= v <= 95.0, (cnn_t, cnn_j, nme_t, nme_j)

    # protocol parity: per-stage average accuracies track across frameworks.
    # 48-144 val videos/stage (~2.1 pts per video at stage 1) — measured
    # deltas on the pinned seed: CNN 2.1/3.1/2.8, NME 6.3/1.0/2.8 pts
    # (both sides are deterministic; the bound's headroom covers future
    # BLAS/runtime changes, ~2x the worst measured cell).
    for a, b in zip(cnn_t, cnn_j):
        assert abs(a - b) <= 10.0, (cnn_t, cnn_j)
    for a, b in zip(nme_t, nme_j):
        assert abs(a - b) <= 10.0, (nme_t, nme_j)
    # the headline number: final-stage average within a tighter band
    # (measured: CNN 2.78, NME 2.78)
    assert abs(cnn_t[-1] - cnn_j[-1]) <= 7.5, (cnn_t, cnn_j)
    assert abs(nme_t[-1] - nme_j[-1]) <= 7.5, (nme_t, nme_j)


# per-method tolerance: measured icarl per-stage deltas on the pinned seed
# across two independent runs (torch CPU kernel selection is not bit-stable
# run-to-run): CNN 2.1/6.3/0.0 and 2.1/5.2/6.9, NME 2.1/5.2/0.7 and
# 4.2/6.3/1.4 — bound at ~1.4x the worst observed. video_mix is wider: the
# tubemix draws themselves cannot match across frameworks (jax mixes on
# device inside the jitted step), so that comparison carries
# augmentation-realization variance on top of cross-framework fp divergence
# (measured at the tuned prob=0.15/epochs=32: CNN 10.4/4.2/13.2,
# NME 2.1/1.0/6.9 pts per stage).
@pytest.mark.parametrize(
    "method,tol", [("icarl", 10.0), ("icarl_video_mix", 15.0)]
)
def test_full_protocol_accuracy_parity_icarl_family(
    parity_tree, tmp_path_factory, method, tol
):
    """Full-protocol comparison for the iCaRL method families: SimpleLinear
    (IncrementalNet) head, soft-target CE with prev-model softmax for
    old-class samples (icarl.py:97-130), average_clips='score' forced, no
    feature KD; icarl_video_mix adds tube-CutMix batch augmentation inside
    the train step (icarl_video_mix.py:19-81). Torch mini-reference vs the
    real CILTrainer on identical data, init, and order."""
    mini, trainer = run_protocol_pair(
        parity_tree,
        tmp_path_factory.mktemp(f"work_torch_{method}"),
        tmp_path_factory.mktemp(f"work_jax_{method}"),
        method=method,
    )

    cnn_t = [np.mean(r) for r in mini.cnn_matrix]
    cnn_j = [np.mean(r) for r in trainer.cnn_matrix]
    nme_t = [np.mean(r) for r in mini.nme_matrix]
    nme_j = [np.mean(r) for r in trainer.nme_matrix]
    print(f"\n[{method}] torch CNN matrix:", mini.cnn_matrix)
    print(f"[{method}] jax   CNN matrix:", trainer.cnn_matrix)
    print(f"[{method}] torch NME matrix:", mini.nme_matrix)
    print(f"[{method}] jax   NME matrix:", trainer.nme_matrix)
    print(f"[{method}] per-stage avg CNN torch/jax:", cnn_t, cnn_j)
    print(f"[{method}] per-stage avg NME torch/jax:", nme_t, nme_j)

    for series in (cnn_t, cnn_j, nme_t, nme_j):
        for v in series:
            assert 30.0 <= v <= 95.0, (cnn_t, cnn_j, nme_t, nme_j)

    for a, b in zip(cnn_t, cnn_j):
        assert abs(a - b) <= tol, (cnn_t, cnn_j)
    for a, b in zip(nme_t, nme_j):
        assert abs(a - b) <= tol, (nme_t, nme_j)
