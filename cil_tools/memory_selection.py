#!/usr/bin/env python
"""Standalone greedy memory selection over a JSON feature dump
(reference cil_tools/memory_selection.py:21-238).

Consumes the output of extract_features.py; for every class greedily picks the
sample whose addition keeps the memory mean closest to the class (data-pool)
mean — with incremental mean update + rollback semantics — and writes an
exemplar JSON ({class: {video_paths, normalized_mean, mean}, method}).
"""

import argparse
import json
import pathlib
from typing import List

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_file")
    parser.add_argument("--dst", default="exemplar.json")
    parser.add_argument("--method", default="cosine", choices=["euclidean", "cosine"])
    parser.add_argument("--budget_size", type=int, default=20)
    return parser.parse_args()


def _normalize(x: np.ndarray, axis=-1) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def calc_mean(features: np.ndarray, normalized_mean: bool) -> np.ndarray:
    if normalized_mean:
        features = _normalize(features, axis=1)
    return features.mean(axis=0)


class Memory:
    """Incremental mean with O(1) pop_last rollback (reference :87-148)."""

    def __init__(self, normalized_mean: bool):
        self.video_paths: List[str] = []
        self.all_features: List[np.ndarray] = []
        self.normalized_mean = normalized_mean
        self._mean = None

    def update(self, video_path: str, features: np.ndarray) -> None:
        self.video_paths.append(video_path)
        self.all_features.append(features)
        self._mean = calc_mean(np.stack(self.all_features), self.normalized_mean)

    def pop_last(self) -> None:
        if not self.video_paths:
            return
        self.video_paths.pop()
        self.all_features.pop()
        self._mean = (
            calc_mean(np.stack(self.all_features), self.normalized_mean)
            if self.all_features
            else None
        )

    @property
    def mean_features(self):
        return self._mean

    def __len__(self):
        return len(self.video_paths)

    def to_json(self):
        return {
            "video_paths": [str(p) for p in self.video_paths],
            "normalized_mean": self.normalized_mean,
            "mean": self._mean.tolist(),
        }


def calc_dist(memory_mean: np.ndarray, pool_mean: np.ndarray, method: str) -> float:
    if method == "euclidean":
        return float(np.linalg.norm(pool_mean - memory_mean))
    cos = float(
        np.dot(_normalize(pool_mean, 0), _normalize(memory_mean, 0))
    )
    return 1.0 - cos


def greedy_memory_selection(
    budget_size: int,
    video_paths: List[str],
    all_features: List[np.ndarray],
    method: str,
) -> Memory:
    normalized_mean = method == "cosine"
    pool_mean = calc_mean(np.stack(all_features), normalized_mean)
    memory = Memory(normalized_mean)
    remaining = set(range(len(video_paths)))

    while len(memory) < min(budget_size, len(video_paths)):
        best_idx, best_dist = None, float("inf")
        for idx in remaining:
            memory.update(video_paths[idx], all_features[idx])
            dist = calc_dist(memory.mean_features, pool_mean, method)
            memory.pop_last()
            if dist < best_dist:
                best_idx, best_dist = idx, dist
        memory.update(video_paths[best_idx], all_features[best_idx])
        remaining.remove(best_idx)
    return memory


def main():
    args = parse_args()
    data = json.loads(pathlib.Path(args.data_file).read_text())

    exemplar = {}
    for class_label, info_per_class in data["features_by_class"].items():
        video_paths = [s["frame_dir"] for s in info_per_class]
        feats = [np.asarray(s["repr_consensus"], dtype=np.float64).reshape(-1) for s in info_per_class]
        memory = greedy_memory_selection(args.budget_size, video_paths, feats, args.method)
        exemplar[int(class_label)] = memory.to_json()

    exemplar["method"] = args.method
    pathlib.Path(args.dst).write_text(json.dumps(exemplar, indent=2))
    print("Saved exemplar at:", args.dst)


if __name__ == "__main__":
    main()
