#!/usr/bin/env python
"""Training-throughput benchmark: TSM-R50, 8x224^2, clips/sec/chip.

Runs the full jitted CIL train step (base method, LSC head, labeled SGD,
bfloat16 compute) on synthetic device-resident batches on the available
chip(s), and prints ONE JSON line:

    {"metric": "train_clips_per_sec_per_chip_tsm_r50_8x224", "value": N,
     "unit": "clips/s/chip", "vs_baseline": N / BASELINE}

BASELINE is the reference's PyTorch+CPU-dataloader training throughput per
GPU for TSM-R50 1x1x8 (~15 clips/s/GPU: the vendored mmaction2 model zoo
reports 74 videos/s *inference* across 8 GPUs at configs/recognition/tsm/
README.md:24, and training costs ~3x a forward plus dataloader stalls). The
driver's north-star target is vs_baseline >= 5 (BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CLIPS_PER_SEC_PER_CHIP = 15.0


def bench_input():
    """BENCH_MODE=input — native C++ decode path vs the cv2 host pipeline on
    synthetic JPEGs (the reference's per-sample CPU chain is the bottleneck
    its dataloader workers hide behind process parallelism; SURVEY.md §3.3)."""
    import pathlib
    import tempfile
    import time

    import cv2
    import numpy as np

    from bdvcil_tpu.data import native

    n = int(os.environ.get("BENCH_INPUT_FRAMES", "256"))
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bdvc_bench_"))
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = rng.integers(0, 255, size=(240, 320, 3)).astype(np.uint8)
        p = tmp / f"f{i:05d}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(str(p))

    # cv2 reference chain: decode -> short-side 256 resize -> center crop 224
    t0 = time.perf_counter()
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        f = 256 / min(h, w)
        img = cv2.resize(img, (int(w * f + 0.5), int(h * f + 0.5)))
        hh, ww = img.shape[:2]
        y, x = (hh - 224) // 2, (ww - 224) // 2
        _ = np.ascontiguousarray(img[y : y + 224, x : x + 224])
    cv2_rate = n / (time.perf_counter() - t0)

    native.decode_resize_crop_batch(paths[:8], 256, 224, 224)  # warm
    t0 = time.perf_counter()
    native.decode_resize_crop_batch(paths, 256, 224, 224)
    native_rate = n / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "native_decode_frames_per_sec",
                "value": round(native_rate, 1),
                "unit": "frames/s",
                "vs_baseline": round(native_rate / cv2_rate, 2),
            }
        )
    )


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer
    from bdvcil_tpu.runtime import TrainState, make_train_step

    num_segments = 8
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "5"))

    model_cfg = dict(
        type="CILRecognizer2D",
        backbone=dict(type="ResNetTSM", depth=50, num_segments=num_segments, shift_div=8),
        cls_head=dict(
            type="IncrementalTSMHead",
            num_classes=51,
            in_channels=2048,
            inc_head_config=dict(type="LocalSimilarityClassifier", out_features=51, nb_proxies=1),
            num_segments=num_segments,
            loss_cls=dict(type="LSCLoss"),
            dropout_ratio=0.5,
        ),
        test_cfg=dict(average_clips="prob"),
    )
    spec = build_model(model_cfg, dtype=jnp.bfloat16)
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, num_segments, 224, 224, 3))
    tx = build_optimizer(
        variables["params"],
        dict(
            type="SGD",
            constructor="CILTSMOptimizerConstructorImprovised",
            paramwise_cfg=dict(fc_lr_scale_factor=5.0),
            lr=0.01,
            momentum=0.9,
            weight_decay=1e-4,
        ),
        dict(type="MultiStepLR", params=dict(milestones=[20, 30], gamma=0.1)),
        steps_per_epoch=100,
    )
    step = make_train_step(spec, tx, num_classes=51, method="base", task_idx=0)
    state = TrainState.create(variables, tx)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.standard_normal((batch, num_segments, 224, 224, 3), dtype=np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 51, size=(batch, 1)))

    keys = jax.random.split(jax.random.PRNGKey(0), steps + warmup)
    for i in range(warmup):
        state, metrics = step(state, None, imgs, labels, {}, keys[i])
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, None, imgs, labels, {}, keys[warmup + i])
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    n_chips = max(1, jax.device_count())
    clips_per_sec_per_chip = batch * steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "train_clips_per_sec_per_chip_tsm_r50_8x224",
                "value": round(clips_per_sec_per_chip, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(clips_per_sec_per_chip / BASELINE_CLIPS_PER_SEC_PER_CHIP, 2),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE", "train") == "input":
        bench_input()
    else:
        main()
