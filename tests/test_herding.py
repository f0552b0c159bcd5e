import numpy as np
import pytest

from bdvcil_tpu.cil.herding import Herding, _l2_normalize


def _meta(features, labels, frame_dirs=None):
    n = len(labels)
    return {
        "repr_": features,
        "label": np.asarray(labels),
        "frame_dir": frame_dirs or [f"v{i}" for i in range(n)],
        "total_frames": np.arange(10, 10 + n),
        "cls_score": np.zeros((n, features.shape[1] if features.ndim == 3 else 1, 3)),
    }


def test_budget_per_class_and_fixed():
    h = Herding(budget_size=10, class_indices=[0, 1], cosine_distance=True, budget_type="class")
    assert h.num_exemplars_per_class == 10
    h = Herding(budget_size=10, class_indices=[0, 1], cosine_distance=True, budget_type="fixed")
    assert h.num_exemplars_per_class == 5


def test_first_pick_is_closest_to_class_mean():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(20, 1, 16))
    labels = np.zeros(20, dtype=int)
    h = Herding(budget_size=3, class_indices=[0], cosine_distance=True)
    meta = h.construct_exemplar(_meta(feats, labels))
    # brute force: first herding pick minimizes 1 - cos(normalized_feat, mean)
    normalized = _l2_normalize(feats[:, 0])
    mean = _l2_normalize(feats[:, 0].mean(axis=0, keepdims=True))
    dists = 1 - (normalized @ mean.T)[:, 0]
    assert meta[0]["indices"][0] == int(np.argmin(dists))


def test_selection_unique_and_sized():
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(30, 1, 8))
    labels = np.array([0] * 15 + [1] * 15)
    h = Herding(budget_size=5, class_indices=[0, 1], cosine_distance=True)
    meta = h.construct_exemplar(_meta(feats, labels))
    for c in (0, 1):
        picks = meta[c]["indices"]
        assert len(picks) == 5
        assert len(set(picks)) == 5
        assert len(meta[c]["frame_dir"]) == 5
        # labels of gathered metadata match the class
        assert (meta[c]["label"] == c).all()


def test_budget_larger_than_class_size():
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(4, 1, 8))
    labels = np.zeros(4, dtype=int)
    h = Herding(budget_size=10, class_indices=[0], cosine_distance=True)
    meta = h.construct_exemplar(_meta(feats, labels))
    assert len(meta[0]["indices"]) == 4  # capped at class size


def test_greedy_matches_bruteforce_euclidean():
    """Step-by-step equivalence with an independent greedy implementation."""
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(12, 1, 6))
    labels = np.zeros(12, dtype=int)
    h = Herding(budget_size=4, class_indices=[0], cosine_distance=False)
    meta = h.construct_exemplar(_meta(feats, labels))

    f = feats[:, 0].astype(np.float64)
    mean = f.mean(axis=0, keepdims=True)
    chosen = []
    remaining = list(range(12))
    moving = np.zeros((1, 6))
    for n in range(1, 5):
        best, best_d = None, np.inf
        for i in remaining:
            cand = moving * (n - 1) / n + f[i] / n
            d = np.linalg.norm(cand - mean)
            if d < best_d:
                best, best_d = i, d
        chosen.append(best)
        moving = moving * (n - 1) / n + f[best] / n
        remaining.remove(best)
    assert meta[0]["indices"] == chosen


def test_clips_storing_shape_handling():
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(6, 2, 1, 8))  # (videos, clips, samples, dims)
    labels = np.zeros(6, dtype=int)
    h = Herding(budget_size=4, class_indices=[0], cosine_distance=True, storing_methods="clips")
    meta = h.construct_exemplar(_meta(feats, labels))
    assert len(meta[0]["indices"]) == 4
    # frame dirs map back to owning videos (rows // num_clips)
    assert all(fd.startswith("v") for fd in meta[0]["frame_dir"])


def test_dimension_checks():
    h = Herding(budget_size=2, class_indices=[0], cosine_distance=True)
    with pytest.raises(ValueError):
        h.construct_exemplar(_meta(np.zeros((4, 8)), np.zeros(4, dtype=int)))  # 2D
    with pytest.raises(NotImplementedError):
        Herding(budget_size=2, class_indices=[0], cosine_distance=True, storing_methods="frames")


def test_class_mean_is_fullset_mean():
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(10, 1, 8))
    labels = np.zeros(10, dtype=int)
    h = Herding(budget_size=2, class_indices=[0], cosine_distance=True)
    meta = h.construct_exemplar(_meta(feats, labels))
    want = _l2_normalize(feats[:, 0].mean(axis=0, keepdims=True))
    np.testing.assert_allclose(meta[0]["class_mean"], want, rtol=1e-9)
