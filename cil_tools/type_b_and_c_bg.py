#!/usr/bin/env python
"""Curate person-free background images (reference cil_tools/type_b_and_c_bg.py).

Runs a person detector over candidate backgrounds and copies images with no
person detections to the output directory. The detector is pluggable: pass a
detections JSON produced offline ({image_path: [[x1,y1,x2,y2,score,cls], ...]})
with --detections, or — when a detectron2/torchvision detector is installed —
use --detector auto. Outputs are just a curated image directory, so any person
detector works (SURVEY.md §2.4 "Person filtering": optional offline tool).
"""

import argparse
import json
import pathlib
import shutil


def parse_args():
    parser = argparse.ArgumentParser(description="Curate person-free backgrounds")
    parser.add_argument("-i", "--image_dir", required=True)
    parser.add_argument("-o", "--out_dir", required=True)
    parser.add_argument("--glob_pattern", default="*")
    parser.add_argument("--detections", help="precomputed detections JSON")
    parser.add_argument("--detector", default="none", choices=["none", "auto"])
    parser.add_argument("--score_thres", type=float, default=0.3)
    parser.add_argument("--person_class", type=int, default=0)
    return parser.parse_args()


def load_precomputed(path):
    data = json.loads(pathlib.Path(path).read_text())

    def has_person(im_file, thres, person_class):
        dets = data.get(str(im_file), [])
        return any(d[4] > thres and int(d[5]) == person_class for d in dets)

    return has_person


def build_auto_detector(thres, person_class):
    try:
        from detectron2 import model_zoo  # optional heavy dep
        from detectron2.config import get_cfg
        from detectron2.engine import DefaultPredictor
        import cv2

        cfg = get_cfg()
        cfg.merge_from_file(
            model_zoo.get_config_file("COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml")
        )
        cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = thres
        cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(
            "COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_3x.yaml"
        )
        predictor = DefaultPredictor(cfg)

        def has_person(im_file, _thres, _person_class):
            outputs = predictor(cv2.imread(str(im_file)))
            return _person_class in outputs["instances"].pred_classes

        return has_person
    except ImportError as e:
        raise SystemExit(
            "no detector available; precompute detections and pass --detections "
            f"(import failed: {e})"
        )


def main():
    args = parse_args()
    image_dir = pathlib.Path(args.image_dir)
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(exist_ok=False, parents=True)

    if args.detections:
        has_person = load_precomputed(args.detections)
    elif args.detector == "auto":
        has_person = build_auto_detector(args.score_thres, args.person_class)
    else:
        raise SystemExit("pass --detections <json> or --detector auto")

    count = 0
    image_files = sorted(image_dir.glob(args.glob_pattern))
    for im_file in image_files:
        if not has_person(im_file, args.score_thres, args.person_class):
            shutil.copy(im_file, out_dir / im_file.name)
            count += 1
    print(f"copied {count}/{len(image_files)} person-free backgrounds to {out_dir}")


if __name__ == "__main__":
    main()
