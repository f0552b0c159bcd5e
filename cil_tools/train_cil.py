#!/usr/bin/env python
"""Main CIL training entry point.

TPU-native equivalent of the reference cil_tools/train_cil.py:1-65: load a
python config, apply CLI overrides via merge_from_dict, and run the per-task
incremental loop on the device mesh.

Usage:
    python cil_tools/train_cil.py configs/ucf101/bgmix_plus_randAug/seed_1000_inc_10.py \
        --work_dir work_dirs/exp --use_cbf --budget_size 5

Deliberate divergence from the reference CLI: boolean flags and --alpha /
--log_every_n_steps only override the config when explicitly passed (the
reference's argparse defaults always clobbered config values, making e.g.
`use_cbf = True` in a config file dead).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdvcil_tpu.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description="Train a CIL video recognizer")
    parser.add_argument("config", help="train config file path")

    parser.add_argument("--work_dir", help="the dir to save logs and models")
    parser.add_argument("--videos_per_gpu", type=int)
    parser.add_argument("--workers_per_gpu", type=int)
    parser.add_argument("--accumulate_grad_batches", type=int)
    parser.add_argument("--testing_videos_per_gpu", type=int)
    parser.add_argument("--testing_workers_per_gpu", type=int)
    parser.add_argument(
        "--starting_task", default=0, type=int,
        help="resume from task i; checkpoints/exemplars are reloaded from work_dir",
    )
    parser.add_argument("--ending_task", type=int, help="stop after this task")
    parser.add_argument("--use_cbf", action="store_true", default=None, help="class-balanced fine-tuning")
    parser.add_argument("--cbf_train_backbone", action="store_true", default=None)
    parser.add_argument("--keep_all_backgrounds", action="store_true", default=None)
    parser.add_argument("--cbf_full_bg", action="store_true", default=None)
    parser.add_argument("--budget_size", type=int)
    parser.add_argument("--alpha", type=float)  # default: config value
    parser.add_argument("--num_epochs_per_task", type=int)
    parser.add_argument("--cbf_num_epochs_per_task", type=int)
    parser.add_argument("--kd_exemplar_only", action="store_true", default=None)
    parser.add_argument("--log_every_n_steps", type=int)  # default: config value
    parser.add_argument("--save_best", action="store_true", default=None, help="validate every epoch, keep best")
    parser.add_argument(
        "--mid_task_checkpointing", action="store_true", default=None,
        help="rolling epoch-boundary train-state snapshots: rerunning with "
        "--starting_task t resumes bit-exact from the last completed epoch "
        "after a preemption (capability the reference lacks)",
    )
    parser.add_argument("--mid_task_ckpt_every", type=int, help="epochs between snapshots (default 1)")
    parser.add_argument("--seed", type=int)
    parser.add_argument("--compute_dtype", choices=["float32", "bfloat16"])
    # accepted for drop-in compatibility with reference launch scripts
    # (cil_tools/train_cil.py:20); device selection is JAX's job on TPU
    parser.add_argument("--gpu_ids", type=int, nargs="*",
                        help="ignored on TPU (kept for reference CLI parity)")
    args = parser.parse_args()

    cfg_dict = {
        k: v for k, v in vars(args).items()
        if v is not None and k not in ("config", "gpu_ids")
    }
    return args, cfg_dict


def main():
    from bdvcil_tpu.parallel import distributed

    distributed.initialize()  # multi-host rendezvous (no-op single-process)
    args, cfg_dict = parse_args()
    config = Config.fromfile(args.config)
    config.merge_from_dict(cfg_dict)
    if "train" in config.data and "alpha" in config.data.train and "alpha" in config:
        config.data.train.alpha = config.alpha

    from bdvcil_tpu.cil import CILTrainer

    trainer = CILTrainer(config)
    trainer.train()


if __name__ == "__main__":
    main()
