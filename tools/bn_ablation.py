#!/usr/bin/env python
"""BN-statistics semantics ablation (round-1 VERDICT Weak #5 / #7).

The reference trains with torch DDP and no SyncBN: every GPU normalizes with
its own 12-video shard's statistics (/root/reference/libs/cil/cil.py:703-709
picks ddp_spawn; nothing configures SyncBatchNorm). The SPMD default here
computes statistics over the global batch. This tool measures how much that
semantic choice (plus the opt-in ghost-stats approximation, models/norm.py)
moves training on a small synthetic task, so the accuracy-parity north star
has a controlled number attached instead of an unquantified variable.

Protocol: R18-TSM (T=2, 32x32), 8 classes x 24 train clips, class signal =
per-class color mean + PER-CLIP jitter + noise, with val clips drawn at a
LARGER jitter so accuracy has an irreducible error floor — the round-2
version saturated every mode at acc 1.0, which discriminates nothing
(round-2 VERDICT Weak #3); this version pins val accuracy in a band where
the modes can actually diverge, across >=3 seeds per mode. 12 epochs of
the real jitted CIL train step (labeled SGD, CE loss), identical data
order and init across modes. Run on CPU:

    JAX_PLATFORMS=cpu python tools/bn_ablation.py

Results are recorded in PARITY.md ("BN statistics semantics").
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_data(rng, means, per_class=24, t=2, hw=32, jitter=0.0, noise=1.0):
    """Class-separable clips: per-class channel means + per-CLIP jitter +
    per-pixel noise. ``jitter`` moves whole clips toward neighboring classes
    (larger on the val split -> irreducible error floor)."""
    xs, ys = [], []
    for c in range(len(means)):
        jit = rng.normal(size=(per_class, 1, 1, 1, 3)) * jitter
        clips = means[c][None, None, None, None, :] + jit + rng.normal(
            size=(per_class, t, hw, hw, 3)
        ) * noise
        xs.append(clips)
        ys.append(np.full((per_class,), c))
    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.int64)
    order = rng.permutation(len(y))
    return x[order], y[order]


def run_mode(name, backbone_extra, x, y, x_val, y_val, epochs=20, batch=32, seed=0):
    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer
    from bdvcil_tpu.runtime import TrainState, make_eval_step, make_train_step

    t = x.shape[1]
    num_classes = int(y.max()) + 1
    cfg = dict(
        type="CILRecognizer2D",
        backbone=dict(
            type="ResNetTSM", depth=18, num_segments=t, shift_div=8, **backbone_extra
        ),
        cls_head=dict(
            type="IncrementalTSMHead",
            num_classes=num_classes,
            in_channels=512,
            inc_head_config=dict(type="SimpleLinear", out_features=num_classes),
            num_segments=t,
            loss_cls=dict(type="CrossEntropyLoss"),
            dropout_ratio=0.5,
        ),
        test_cfg=dict(average_clips="prob"),
    )
    spec = build_model(cfg)
    variables = init_model_params(spec, jax.random.PRNGKey(seed), (batch, t, 32, 32, 3))
    tx = build_optimizer(
        variables["params"],
        dict(type="SGD", lr=0.02, momentum=0.9, weight_decay=1e-4),
    )
    state = TrainState.create(variables, tx)
    step = make_train_step(spec, tx, num_classes=num_classes, method="base", task_idx=0)
    eval_step = make_eval_step(spec, num_classes)

    key = jax.random.PRNGKey(seed + 1)
    n = len(y)
    order_rng = np.random.default_rng(seed + 2)
    loss = float("nan")
    for epoch in range(epochs):
        order = order_rng.permutation(n)
        for i in range(0, n - batch + 1, batch):
            idx = order[i : i + batch]
            key, sk = jax.random.split(key)
            state, metrics = step(
                state, None, jnp.asarray(x[idx]), jnp.asarray(y[idx][:, None]), {}, sk
            )
        loss = float(metrics["loss"])

    def acc(xa, ya):
        correct = 0
        for i in range(0, len(ya), batch):
            out = eval_step(state.variables, jnp.asarray(xa[i : i + batch]))
            scores = np.asarray(out["cls_score"]).mean(axis=1)  # (B, nc)
            correct += int((np.argmax(scores, -1) == ya[i : i + batch]).sum())
        return correct / len(ya)

    rec = {
        "mode": name,
        "final_train_loss": round(loss, 4),
        "train_acc": round(acc(x, y), 4),
        "val_acc": round(acc(x_val, y_val), 4),
    }
    print(json.dumps(rec))
    return rec


def main():
    seeds = [int(s) for s in os.environ.get("BN_SEEDS", "0,1,2").split(",")]
    epochs = int(os.environ.get("BN_EPOCHS", "24"))
    modes = [
        ("global_batch (SPMD default)", {}),
        ("per_device_8 (reference DDP semantics, bn_groups=8)", {"bn_groups": 8}),
        ("ghost_quarter (bn_stats_rows = rows/4)", {"bn_stats_rows": 16}),
    ]
    summary = {name: [] for name, _ in modes}
    for seed in seeds:
        rng = np.random.default_rng(seed)
        means = rng.normal(size=(8, 3)) * 0.8
        x, y = make_data(rng, means, jitter=0.5, noise=1.0)
        x_val, y_val = make_data(
            np.random.default_rng(seed + 100), means, per_class=8, jitter=0.7, noise=1.0
        )
        for name, extra in modes:
            rec = run_mode(name, extra, x, y, x_val, y_val, epochs=epochs, seed=seed)
            summary[name].append(rec["val_acc"])
    agg = {
        name: {
            "val_accs": accs,
            "mean": round(float(np.mean(accs)), 4),
            "spread": round(float(np.max(accs) - np.min(accs)), 4),
        }
        for name, accs in summary.items()
    }
    print(json.dumps({"ablation": "bn_semantics", "seeds": seeds, "summary": agg}))


if __name__ == "__main__":
    main()
