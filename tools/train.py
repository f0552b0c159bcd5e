#!/usr/bin/env python
"""Plain single-task (non-CIL) trainer.

TPU-native equivalent of the reference tools/train.py:87-220 (the vendored
mmaction2 path used for single-stage baselines like
configs/cil/tsm/tsm_r34_1x1x8_25e_ucf101_rgb_task_0.py): build model + dataset
from a config, train for total_epochs with the configured optimizer/schedule,
validate each epoch, checkpoint to work_dir. Distribution is the device mesh
(no launcher needed — one process drives all local chips; `--launcher` is
accepted for CLI parity and ignored).
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bdvcil_tpu.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description="Train a recognizer (single task)")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir", help="dir to save logs and models")
    parser.add_argument("--resume-from", help="checkpoint to resume from")
    parser.add_argument("--validate", action="store_true", default=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument(
        "--launcher", choices=["none", "pytorch", "slurm", "mpi"], default="none",
        help="accepted for reference-CLI parity; the device mesh needs no launcher",
    )
    parser.add_argument("--cfg-options", nargs="+", default=[], help="key=value overrides")
    return parser.parse_args()


def main():
    from bdvcil_tpu.parallel import distributed

    distributed.initialize()  # multi-host rendezvous (no-op single-process)
    args = parse_args()
    cfg = Config.fromfile(args.config)
    overrides = {}
    for kv in args.cfg_options:
        key, value = kv.split("=", 1)
        try:
            import ast

            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        overrides[key] = value
    if overrides:
        cfg.merge_from_dict(overrides)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    if args.seed is not None:
        cfg.seed = args.seed

    import jax

    from bdvcil_tpu.data import DataLoader, build_dataset
    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer
    from bdvcil_tpu.parallel import make_mesh
    from bdvcil_tpu.runtime import TrainState, make_eval_step, make_train_step, save_checkpoint, load_checkpoint
    from bdvcil_tpu.runtime.loops import run_inference, train_epochs
    from bdvcil_tpu.utils import MetricLogger, get_logger

    logger = get_logger("bdvcil.tools.train")
    work_dir = pathlib.Path(cfg.get("work_dir", "work_dirs/train"))
    work_dir.mkdir(parents=True, exist_ok=True)
    cfg.dump(str(work_dir / "config.py"))

    seed = cfg.get("seed", 0)
    spec = build_model(cfg.model)
    num_classes = spec.num_classes
    variables = init_model_params(spec, jax.random.PRNGKey(seed), (1, spec.num_segments, 64, 64, 3))
    if args.resume_from:
        variables, _ = load_checkpoint(args.resume_from)

    train_ds = build_dataset(dict(cfg.data.train))
    val_ds = build_dataset(dict(cfg.data.val)) if "val" in cfg.data else None
    loader = DataLoader(
        train_ds,
        batch_size=cfg.videos_per_gpu * max(1, jax.device_count()),
        shuffle=True,
        num_workers=cfg.get("workers_per_gpu", 4),
        drop_last=False,
        pad_to_batch=True,
        seed=seed,
    )

    total_epochs = cfg.get("total_epochs", 1)
    accumulate = cfg.get("accumulate_grad_batches", 1)
    sched_cfg = cfg.get("lr_scheduler")
    grad_clip = (cfg.get("optimizer_config") or {}).get("grad_clip", {}).get("max_norm")
    tx = build_optimizer(
        variables["params"],
        cfg.optimizer,
        sched_cfg,
        steps_per_epoch=max(1, len(loader) // accumulate),
        grad_clip=grad_clip,
        accumulate_steps=accumulate,
    )
    mesh = make_mesh()
    step_fn = make_train_step(spec, tx, num_classes=num_classes, method="base", task_idx=0)
    state = TrainState.create(variables, tx)

    metric_logger = MetricLogger(str(work_dir))

    def epoch_hook(epoch, state_now):
        variables_now = {"params": state_now.params, "batch_stats": state_now.batch_stats}
        save_checkpoint(work_dir / "latest.msgpack", variables_now, meta={"epoch": epoch})
        if val_ds is not None and args.validate:
            val_loader = DataLoader(val_ds, batch_size=cfg.get("testing_videos_per_gpu", cfg.videos_per_gpu), shuffle=False)
            eval_step = make_eval_step(spec, num_classes)
            pred = run_inference(eval_step, variables_now, val_loader, mesh=mesh, pad_batch_to=val_loader.batch_size)
            score = pred["cls_score"].mean(axis=1)
            acc = float((np.argmax(score, -1) == pred["labels"]).mean())
            logger.info("epoch %d val top1=%.4f", epoch, acc)
            metric_logger.log({"val_top1": acc})

    state, _ = train_epochs(
        step_fn,
        state,
        None,
        loader,
        total_epochs,
        jax.random.PRNGKey(seed),
        mesh=mesh,
        metric_logger=metric_logger,
        log_every_n_steps=cfg.get("log_every_n_steps", 20),
        phase="train",
        epoch_hook=epoch_hook,
    )
    save_checkpoint(
        work_dir / "final.msgpack",
        {"params": state.params, "batch_stats": state.batch_stats},
        meta={"epochs": total_epochs},
    )
    logger.info("done; checkpoints in %s", work_dir)


if __name__ == "__main__":
    main()
