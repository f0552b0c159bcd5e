#!/usr/bin/env python
"""Evaluate one checkpoint at a chosen task index (reference
cil_tools/test_single_ckpt.py:31-44)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdvcil_tpu.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description="Test a single checkpoint")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir")
    parser.add_argument("--ckpt", required=True, help="path to checkpoint")
    parser.add_argument("--starting_task", required=True, type=int, help="task index to test at")
    parser.add_argument("--testing_videos_per_gpu", type=int)
    parser.add_argument("--testing_workers_per_gpu", type=int)
    parser.add_argument("--no_nme", action="store_true")
    # accepted for drop-in compatibility with reference launch scripts;
    # device selection is JAX's job on TPU
    parser.add_argument("--gpu_ids", type=int, nargs="*", help="ignored on TPU")
    args = parser.parse_args()
    cfg_dict = {
        k: v
        for k, v in vars(args).items()
        if v is not None and k not in ("config", "no_nme", "gpu_ids")
    }
    return args, cfg_dict


def main():
    from bdvcil_tpu.parallel import distributed

    distributed.initialize()  # multi-host rendezvous (no-op single-process)
    args, cfg_dict = parse_args()
    config = Config.fromfile(args.config)
    config.merge_from_dict(cfg_dict)
    config.ending_task = config.starting_task

    from bdvcil_tpu.cil import CILTrainer

    trainer = CILTrainer(config, dump_config=False)
    trainer.single_ckpt_testing(ckpt_file=config.ckpt, test_nme=not args.no_nme)


if __name__ == "__main__":
    main()
