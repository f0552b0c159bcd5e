#!/usr/bin/env python
"""Per-sample feature dump (reference cil_tools/extract_features.py:16-96):
run the model over the train split with the validation pipeline, keep only
correctly-classified samples, dump {cls_score, repr_consensus} per sample to
JSON (feeds the standalone memory_selection tool)."""

import argparse
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdvcil_tpu.config import Config


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("root_dir", help="directory containing config + checkpoint")
    parser.add_argument("--config_file", default="config.py")
    parser.add_argument("--ckpt_file", default="latest.msgpack")
    parser.add_argument("--dst", default="features/out.json")
    parser.add_argument("--batch_size", type=int, default=8)
    return parser.parse_args()


def main():
    from bdvcil_tpu.parallel import distributed

    distributed.initialize()  # multi-host rendezvous (no-op single-process)
    args = parse_args()
    root_dir = pathlib.Path(args.root_dir)
    dst = root_dir / args.dst
    dst.parent.mkdir(exist_ok=True, parents=True)

    cfg = Config.fromfile(str(root_dir / args.config_file))

    from bdvcil_tpu.data import DataLoader, build_dataset
    from bdvcil_tpu.models import build_model
    from bdvcil_tpu.models.heads import head_param_path
    from bdvcil_tpu.runtime import load_checkpoint, make_eval_step
    from bdvcil_tpu.runtime.loops import run_inference

    variables, meta = load_checkpoint(str(root_dir / args.ckpt_file))
    spec = build_model(cfg.model)
    head = head_param_path(variables["params"])
    num_classes = (head.get("fc_weights") or head.get("fc_weight")).shape[0]

    # train split through the (deterministic) validation pipeline
    train_cfg = dict(cfg.data.train)
    train_cfg["pipeline"] = cfg.data.val.pipeline
    train_cfg["test_mode"] = True
    dataset = build_dataset(train_cfg)
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False, num_workers=2)

    eval_step = make_eval_step(spec, num_classes)
    pred = run_inference(eval_step, variables, loader, extract_repr=True, pad_batch_to=args.batch_size)
    cls_score = pred["cls_score"].mean(axis=1)  # (N, nc)
    repr_consensus = pred["repr"].mean(axis=1)  # (N, C)

    features_by_class = {}
    for i, info in enumerate(dataset.video_infos):
        if int(np.argmax(cls_score[i])) != info["label"]:
            continue  # keep correctly-classified samples only
        entry = dict(info)
        entry.pop("all_detections", None)
        entry["cls_score"] = cls_score[i].tolist()
        entry["repr_consensus"] = repr_consensus[i].tolist()
        features_by_class.setdefault(int(info["label"]), []).append(entry)

    fc = head.get("fc_weights") if "fc_weights" in head else head.get("fc_weight")
    data = {
        "features_by_class": features_by_class,
        "model_weights": np.asarray(fc).tolist(),
    }
    if distributed.is_primary():  # every process holds the gathered scores;
        dst.write_text(json.dumps(data))  # rank 0 writes
        print("Saved features at:", dst)
    distributed.sync_processes("extract_features_write")


if __name__ == "__main__":
    main()
