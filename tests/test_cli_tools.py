"""CLI surface tests: argument parsing + config merge semantics of the
cil_tools entry points (reference flags, SURVEY.md §2.2), with the heavy
trainer stubbed out."""

import json
import sys

import numpy as np
import pytest

import cil_tools.train_cil as train_cil
import cil_tools.test_cil as test_cil
import cil_tools.memory_selection as memsel
from bdvcil_tpu.config import Config


def _write_cfg(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(
        "alpha = 0.5\n"
        "budget_size = 5\n"
        "data = dict(train=dict(alpha=0.5))\n"
        "work_dir = 'w'\n"
    )
    return str(p)


def test_train_cil_arg_merge(tmp_path, monkeypatch):
    captured = {}

    class FakeTrainer:
        def __init__(self, config):
            captured["config"] = config

        def train(self):
            captured["trained"] = True

    import bdvcil_tpu.cil as cil_pkg

    monkeypatch.setattr(cil_pkg, "CILTrainer", FakeTrainer)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "train_cil.py",
            _write_cfg(tmp_path),
            "--work_dir",
            str(tmp_path / "wd"),
            "--budget_size",
            "9",
            "--alpha",
            "0.3",
            "--use_cbf",
            "--save_best",
            "--gpu_ids", "0", "1",  # reference-script compat: accepted, ignored
        ],
    )
    train_cil.main()
    cfg = captured["config"]
    assert captured["trained"]
    assert cfg.budget_size == 9
    assert cfg.use_cbf is True and cfg.save_best is True
    assert cfg.data.train.alpha == 0.3  # --alpha propagates into the dataset
    assert cfg.work_dir == str(tmp_path / "wd")
    assert "gpu_ids" not in cfg  # parity flag accepted but never merged


def test_test_cil_forces_task_zero(tmp_path, monkeypatch):
    captured = {}

    class FakeTrainer:
        def __init__(self, config, dump_config=True):
            captured["config"] = config
            captured["dump"] = dump_config

        def cil_testing(self, test_nme=False):
            captured["nme"] = test_nme

    import bdvcil_tpu.cil as cil_pkg

    monkeypatch.setattr(cil_pkg, "CILTrainer", FakeTrainer)
    monkeypatch.setattr(sys, "argv", ["test_cil.py", _write_cfg(tmp_path)])
    test_cil.main()
    assert captured["config"].starting_task == 0
    assert captured["dump"] is False
    assert captured["nme"] is True


def test_memory_selection_tool_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    features = {
        "features_by_class": {
            "0": [
                {"frame_dir": f"v{i}", "repr_consensus": rng.normal(size=8).tolist()}
                for i in range(6)
            ],
            "1": [
                {"frame_dir": f"w{i}", "repr_consensus": rng.normal(size=8).tolist()}
                for i in range(6)
            ],
        },
        "model_weights": [[0.0] * 8],
    }
    data_file = tmp_path / "features.json"
    data_file.write_text(json.dumps(features))
    dst = tmp_path / "exemplar.json"
    monkeypatch.setattr(
        sys, "argv", ["memory_selection.py", str(data_file), "--dst", str(dst), "--budget_size", "3"]
    )
    memsel.main()
    out = json.loads(dst.read_text())
    assert out["method"] == "cosine"
    assert len(out["0"]["video_paths"]) == 3
    assert len(set(out["0"]["video_paths"])) == 3
    assert len(out["1"]["mean"]) == 8
