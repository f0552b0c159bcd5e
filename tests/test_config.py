import copy
import os

import pytest

from bdvcil_tpu.config import Config, ConfigDict


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_fromfile_basic(tmp_path):
    path = _write(
        tmp_path,
        "cfg.py",
        "lr = 0.01\nmodel = dict(type='X', depth=34)\ntask_splits = [[0, 1], [2]]\n",
    )
    cfg = Config.fromfile(path)
    assert cfg.lr == 0.01
    assert cfg.model.type == "X"
    assert cfg.model["depth"] == 34
    assert cfg.task_splits[1] == [2]
    assert cfg.filename == path


def test_fromfile_excludes_modules_and_functions(tmp_path):
    path = _write(tmp_path, "cfg.py", "import os\nx = os.path.join('a', 'b')\ndef f():\n    pass\n")
    cfg = Config.fromfile(path)
    assert "os" not in cfg
    assert "f" not in cfg
    assert cfg.x == os.path.join("a", "b")


def test_base_inheritance(tmp_path):
    _write(tmp_path, "base.py", "a = 1\nmodel = dict(type='X', depth=34, head=dict(nc=5))\n")
    path = _write(
        tmp_path,
        "child.py",
        "_base_ = ['base.py']\nmodel = dict(depth=50)\nb = 2\n",
    )
    cfg = Config.fromfile(path)
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.model.type == "X"
    assert cfg.model.depth == 50  # child overrides
    assert cfg.model.head.nc == 5  # merged, not replaced


def test_base_delete_key(tmp_path):
    _write(tmp_path, "base.py", "model = dict(type='X', depth=34)\n")
    path = _write(tmp_path, "child.py", "_base_ = 'base.py'\nmodel = dict(_delete_=True, type='Y')\n")
    cfg = Config.fromfile(path)
    assert dict(cfg.model) == {"type": "Y"}


def test_merge_from_dict_dotted():
    cfg = Config.fromdict({"data": {"train": {"alpha": 0.5, "prob": 0.25}}, "lr": 0.1})
    cfg.merge_from_dict({"data.train.alpha": 0.3, "work_dir": "w"})
    assert cfg.data.train.alpha == 0.3
    assert cfg.data.train.prob == 0.25
    assert cfg.work_dir == "w"


def test_attribute_set_and_contains():
    cfg = Config.fromdict({})
    cfg.starting_task = 3
    cfg["data"] = {"val": {"ann_file": ""}}
    cfg.data.val.ann_file = "x.txt"
    assert "starting_task" in cfg
    assert cfg.data.val.ann_file == "x.txt"
    assert isinstance(cfg.data, ConfigDict)


def test_deepcopy_independent():
    cfg = Config.fromdict({"d": {"x": 1}})
    cfg2 = copy.deepcopy(cfg)
    cfg2.d.x = 9
    assert cfg.d.x == 1


def test_dump_roundtrip(tmp_path):
    cfg = Config.fromdict(
        {
            "lr": 0.01,
            "model": {"type": "X", "scales": (1, 0.875), "names": ["a", "b"]},
            "flag": True,
            "none_val": None,
        }
    )
    out = str(tmp_path / "dumped.py")
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert cfg2.lr == 0.01
    assert cfg2.model.type == "X"
    assert tuple(cfg2.model.scales) == (1, 0.875)
    assert cfg2.model.names == ["a", "b"]
    assert cfg2.flag is True
    assert cfg2.none_val is None


def test_get_default():
    cfg = Config.fromdict({"a": 1})
    assert cfg.get("missing", 42) == 42
    with pytest.raises(AttributeError):
        _ = cfg.missing
