#!/usr/bin/env python
"""Batch inference on unlabeled rawframe videos (serving surface).

Not present in the reference — its eval tools (test_cil.py,
test_single_ckpt.py) only score labeled datasets. This tool classifies a
directory of rawframe videos with a trained checkpoint and writes per-video
top-k predictions:

    python cil_tools/predict.py <config.py> <ckpt.msgpack> <frames_dir> \
        [--output preds.json] [--topk 5] [--batch_size 8]

``frames_dir`` is either a single video's frame directory (img_00001.jpg
...) or a directory of such directories. Uses the config's test pipeline
(deterministic) and the checkpoint sidecar's classifier width. If the
work dir next to the config has ``class_indices_mapping.json`` (written by
create_annotation_files.py), predictions are also reported as original
dataset labels.
"""

import argparse
import json
import os
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bdvcil_tpu.config import Config


def parse_args():
    parser = argparse.ArgumentParser(description="Classify rawframe videos")
    parser.add_argument("config", help="config file (for model + test pipeline)")
    parser.add_argument("checkpoint", help="msgpack checkpoint")
    parser.add_argument("frames_dir", help="video frame dir, or a dir of them")
    parser.add_argument("--output", default=None, help="write JSON here (default stdout)")
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--filename_tmpl", default="img_{:05}.jpg")
    return parser.parse_args()


def discover_videos(root: pathlib.Path, tmpl: str):
    """(name, dir, num_frames, start_index) for every frame directory under
    root.

    Frames are counted by probing the filename template sequentially, so a
    stray non-frame image in the directory can neither inflate the count
    nor (when the count feeds SampleFrames) point the pipeline at a
    nonexistent frame index. Both 0-based (img_00000 first) and 1-based
    rawframe layouts are detected; the observed start index is returned so
    the dataset samples frame 0 when it exists."""
    probes = [tmpl.format(0), tmpl.format(1)]

    def _start(d: pathlib.Path):
        for start, probe in zip((0, 1), probes):
            if (d / probe).exists():
                return start
        return None

    if _start(root) is not None:
        dirs = [root]
    else:
        dirs = sorted(d for d in root.iterdir() if d.is_dir() and _start(d) is not None)
    out = []
    for d in dirs:
        start = _start(d)
        n = 0
        while (d / tmpl.format(start + n)).exists():
            n += 1
        if n:
            out.append((d.name, d, n, start))
    return out


def main():
    from bdvcil_tpu.parallel import distributed

    distributed.initialize()  # multi-host rendezvous (no-op single-process)
    args = parse_args()
    cfg = Config.fromfile(args.config)

    from bdvcil_tpu.data import DataLoader, build_dataset
    from bdvcil_tpu.models import build_model
    from bdvcil_tpu.models.heads import head_param_path
    from bdvcil_tpu.runtime import load_checkpoint, make_eval_step
    from bdvcil_tpu.runtime.loops import run_inference
    from bdvcil_tpu.models.recognizer import average_clips as avg_clips_fn

    videos = discover_videos(pathlib.Path(args.frames_dir), args.filename_tmpl)
    if not videos:
        sys.exit(f"no rawframe videos found under {args.frames_dir}")

    variables, meta = load_checkpoint(args.checkpoint)
    spec = build_model(cfg.model)
    head = head_param_path(variables["params"])
    fc = head.get("fc_weights") if "fc_weights" in head else head.get("fc_weight")
    num_classes = fc.shape[0]

    # placeholder ann file (label 0) + the config's test pipeline; the real
    # frame dirs are injected as video_infos afterwards so paths containing
    # whitespace never round-trip through the space-delimited ann format
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for i, (name, d, n, start) in enumerate(videos):
            f.write(f"v{i} {n} 0\n")
        ann = f.name
    ds_cfg = dict(cfg.data.test)
    ds_cfg.update(ann_file=ann, data_prefix="", test_mode=True)
    ds_cfg.pop("bg_dir", None)
    if ds_cfg.get("type") != "RawframeDataset":
        ds_cfg["type"] = "RawframeDataset"  # no augmentation at predict time
    dataset = build_dataset(ds_cfg)
    # per-video start_index: 0-based layouts (img_00000.jpg first) must shift
    # the sampler, or frame 0 would never be read and the last index would
    # probe past the end; mixed 0-/1-based dirs each keep their own start
    dataset.video_infos = [
        dict(frame_dir=str(d), total_frames=n, label=0, start_index=start)
        for name, d, n, start in videos
    ]
    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False, num_workers=2)

    eval_step = make_eval_step(spec, num_classes)
    pred = run_inference(eval_step, variables, loader, pad_batch_to=args.batch_size)
    mode = cfg.model.get("test_cfg", {}).get("average_clips", "prob") or "score"
    scores = np.asarray(avg_clips_fn(pred["cls_score"], mode))  # (N, nc)

    inv_map = None
    mapping_path = pathlib.Path(args.config).parent / "class_indices_mapping.json"
    if mapping_path.exists():
        mapping = json.loads(mapping_path.read_text())  # original -> incremental
        inv_map = {int(v): k for k, v in mapping.items()}

    topk = min(args.topk, num_classes)
    results = []
    for i, (name, d, n, start) in enumerate(videos):
        order = np.argsort(scores[i])[::-1][:topk]
        entry = {
            "video": name,
            "num_frames": n,
            "topk": [
                {
                    "class_index": int(c),
                    "score": float(scores[i, c]),
                    **({"original_label": inv_map[int(c)]} if inv_map and int(c) in inv_map else {}),
                }
                for c in order
            ],
        }
        results.append(entry)
    os.unlink(ann)

    payload = json.dumps({"predictions": results}, indent=2)
    # every process computed the full gathered scores; only rank 0 reports,
    # and all ranks barrier before exiting so the coordination service is
    # not torn down under rank 0 mid-write (same pattern as
    # extract_features.py).
    if distributed.is_primary():
        if args.output:
            pathlib.Path(args.output).write_text(payload)
            print(f"wrote {len(results)} predictions to {args.output}")
        else:
            print(payload)
    distributed.sync_processes("predict_write")


if __name__ == "__main__":
    main()
