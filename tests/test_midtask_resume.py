"""Mid-task preemption-safe resume (runtime/checkpoint.py train snapshots).

The reference has NO mid-task recovery: Lightning checkpointing is disabled
(reference libs/cil/cil.py:750) and `--starting_task` re-runs the whole task.
Our rolling epoch-boundary snapshot (params + batch stats + optimizer state +
step + rng key) must make an interrupted run bit-identical to an
uninterrupted one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdvcil_tpu.models import build_model, init_model_params
from bdvcil_tpu.optim import build_optimizer
from bdvcil_tpu.runtime import TrainState, make_train_step
from bdvcil_tpu.runtime.checkpoint import (
    clear_train_snapshot,
    load_train_snapshot,
    peek_train_snapshot_meta,
    save_train_snapshot,
)
from bdvcil_tpu.runtime.loops import train_epochs
from tests.test_models import tiny_model_cfg, T


class FakeLoader:
    """Deterministic per-epoch batches, like the real loaders (seed, epoch)."""

    def __init__(self, num_batches=3, b=4, nc=5):
        self.num_batches, self.b, self.nc = num_batches, b, nc
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        rng = np.random.default_rng(1000 + self.epoch)
        for _ in range(self.num_batches):
            yield {
                "imgs": jnp.asarray(rng.standard_normal((self.b, T, 32, 32, 3), dtype=np.float32)),
                "label": jnp.asarray(rng.integers(0, self.nc, size=(self.b, 1))),
            }


def _setup():
    spec = build_model(tiny_model_cfg(num_classes=5))
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    tx = build_optimizer(
        variables["params"],
        dict(type="SGD", constructor="CILTSMOptimizerConstructorImprovised",
             paramwise_cfg=dict(fc_lr_scale_factor=5.0), lr=0.05, momentum=0.9,
             weight_decay=1e-4),
        dict(type="MultiStepLR", params=dict(milestones=[2], gamma=0.1)),
        steps_per_epoch=3,
    )
    step_fn = make_train_step(spec, tx, num_classes=5, method="base", task_idx=0, donate=False)
    state = TrainState.create(variables, tx)
    return step_fn, state, tx, variables


def test_snapshot_roundtrip_exact(tmp_path):
    step_fn, state, tx, variables = _setup()
    loader = FakeLoader()
    state, _ = train_epochs(step_fn, state, None, loader, 2, jax.random.PRNGKey(7))
    path = tmp_path / "snap.msgpack"
    save_train_snapshot(path, state, jax.random.PRNGKey(9),
                        meta=dict(task=1, phase="inc_step", epoch=1, num_classes=5))
    assert peek_train_snapshot_meta(path) == dict(task=1, phase="inc_step", epoch=1, num_classes=5)

    target = TrainState.create(variables, tx)  # fresh shapes/structure
    restored, key, meta2 = load_train_snapshot(path, target)
    assert meta2 == dict(task=1, phase="inc_step", epoch=1, num_classes=5)
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(np.asarray(key), np.asarray(jax.random.PRNGKey(9)))
    jax.tree.map(np.testing.assert_array_equal, jax.tree.leaves(state.params),
                 jax.tree.leaves(restored.params))
    jax.tree.map(np.testing.assert_array_equal, jax.tree.leaves(state.opt_state),
                 jax.tree.leaves(restored.opt_state))

    clear_train_snapshot(path)
    assert peek_train_snapshot_meta(path) is None


@pytest.mark.slow  # three fresh step compiles; the roundtrip test covers the fast tier
def test_interrupted_run_bit_identical(tmp_path):
    """3 straight epochs == 2 epochs + snapshot + resume for the 3rd."""
    num_epochs = 3
    key0 = jax.random.PRNGKey(42)

    # uninterrupted
    step_fn, state, tx, variables = _setup()
    ref_state, _ = train_epochs(step_fn, state, None, FakeLoader(), num_epochs, key0)

    # interrupted after epoch 1 (snapshots written at every epoch boundary)
    step_fn2, state2, tx2, variables2 = _setup()
    path = tmp_path / "snap.msgpack"
    snaps = {}

    def snapshot_hook(epoch, st, rng):
        save_train_snapshot(path, st, rng,
                            meta=dict(task=0, phase="inc_step", epoch=epoch, num_classes=5))
        snaps[epoch] = True

    state2, _ = train_epochs(step_fn2, state2, None, FakeLoader(), 2, key0,
                             snapshot_hook=snapshot_hook)
    assert snaps == {0: True, 1: True}
    # "process dies here" — a fresh process rebuilds everything from scratch
    step_fn3, state3, tx3, variables3 = _setup()
    meta = peek_train_snapshot_meta(path)
    assert meta["epoch"] == 1
    restored, key, _ = load_train_snapshot(path, TrainState.create(variables3, tx3))
    final, _ = train_epochs(step_fn3, restored, None, FakeLoader(), num_epochs, key,
                            start_epoch=meta["epoch"] + 1)

    assert int(final.step) == int(ref_state.step)
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(final.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats), jax.tree.leaves(final.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref_state.opt_state), jax.tree.leaves(final.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stale_snapshot_not_restored(tmp_path):
    """A snapshot from a different task/phase/width must be ignored by the
    trainer's matching logic (peek + compare is the contract)."""
    step_fn, state, tx, variables = _setup()
    path = tmp_path / "snap.msgpack"
    save_train_snapshot(path, state, jax.random.PRNGKey(0),
                        meta=dict(task=2, phase="cbf_step", epoch=0, num_classes=7))
    meta = peek_train_snapshot_meta(path)
    assert not (meta["task"] == 3 and meta["phase"] == "cbf_step")
    assert not (meta["task"] == 2 and meta["phase"] == "inc_step")
    assert meta["num_classes"] == 7


@pytest.mark.slow
def test_trainer_preemption_resume_bit_identical(tmp_path_factory, monkeypatch):
    """Kill the trainer mid-task-1 (after 2 of 3 epochs), rerun with
    --starting_task 1 + mid_task_checkpointing: final task-1 checkpoint must
    be bit-identical to an uninterrupted run."""
    from bdvcil_tpu.cil import CILTrainer
    from bdvcil_tpu.runtime import load_checkpoint
    import bdvcil_tpu.cil.trainer as trainer_mod
    from tests.synthetic import make_rawframe_tree
    from tests.test_cil_e2e import make_cil_config

    root = tmp_path_factory.mktemp("midtask")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=3, videos_per_class=4, num_frames=8, size=(70, 92)
    )
    common = dict(
        task_splits=[[0, 1], [2]], ending_task=1, num_epochs_per_task=3,
        mid_task_checkpointing=True,
    )

    # uninterrupted baseline
    wd_a = root / "work_a"
    cfg_a = make_cil_config(root, frames_root, train_ann, val_ann, wd_a, **common)
    CILTrainer(cfg_a).train()

    # interrupted run: die after 2 of task 1's 3 inc_step epochs
    wd_b = root / "work_b"
    real = trainer_mod.train_epochs

    class Preempted(Exception):
        pass

    def dying(step_fn, state, prev, loader, num_epochs, key, **kw):
        if kw.get("task_idx") == 1 and kw.get("phase") == "inc_step":
            real(step_fn, state, prev, loader, 2, key, **kw)
            raise Preempted()
        return real(step_fn, state, prev, loader, num_epochs, key, **kw)

    monkeypatch.setattr(trainer_mod, "train_epochs", dying)
    cfg_b = make_cil_config(root, frames_root, train_ann, val_ann, wd_b, **common)
    with pytest.raises(Preempted):
        CILTrainer(cfg_b).train()
    monkeypatch.setattr(trainer_mod, "train_epochs", real)
    assert (wd_b / "ckpt" / "mid_task_snapshot_inc_step.msgpack").exists()

    # fresh process resumes task 1 from the snapshot
    cfg_b2 = make_cil_config(root, frames_root, train_ann, val_ann, wd_b,
                             starting_task=1, **common)
    CILTrainer(cfg_b2, dump_config=False).train()
    assert not (wd_b / "ckpt" / "mid_task_snapshot_inc_step.msgpack").exists()  # cleared

    va, _ = load_checkpoint(wd_a / "ckpt" / "ckpt_task_1.msgpack")
    vb, _ = load_checkpoint(wd_b / "ckpt" / "ckpt_task_1.msgpack")
    for a, b in zip(jax.tree.leaves(va), jax.tree.leaves(vb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_cbf_preemption_resume_bit_identical(tmp_path_factory, monkeypatch):
    """Preemption during the CBF phase: the cbf-phase snapshot must survive
    the inc_step rerun (per-phase snapshot files) and resume bit-exact."""
    from bdvcil_tpu.cil import CILTrainer
    from bdvcil_tpu.runtime import load_checkpoint
    import bdvcil_tpu.cil.trainer as trainer_mod
    from tests.synthetic import make_rawframe_tree
    from tests.test_cil_e2e import make_cil_config

    root = tmp_path_factory.mktemp("midtask_cbf")
    frames_root, train_ann, val_ann = make_rawframe_tree(
        root, num_classes=3, videos_per_class=4, num_frames=8, size=(70, 92)
    )
    common = dict(
        task_splits=[[0, 1], [2]], ending_task=1, num_epochs_per_task=2,
        cbf_num_epochs_per_task=3, use_cbf=True, mid_task_checkpointing=True,
    )

    wd_a = root / "work_a"
    CILTrainer(make_cil_config(root, frames_root, train_ann, val_ann, wd_a, **common)).train()

    wd_b = root / "work_b"
    real = trainer_mod.train_epochs

    class Preempted(Exception):
        pass

    def dying(step_fn, state, prev, loader, num_epochs, key, **kw):
        if kw.get("task_idx") == 1 and kw.get("phase") == "cbf_step":
            real(step_fn, state, prev, loader, 2, key, **kw)  # 2 of 3 epochs
            raise Preempted()
        return real(step_fn, state, prev, loader, num_epochs, key, **kw)

    monkeypatch.setattr(trainer_mod, "train_epochs", dying)
    with pytest.raises(Preempted):
        CILTrainer(make_cil_config(root, frames_root, train_ann, val_ann, wd_b, **common)).train()
    monkeypatch.setattr(trainer_mod, "train_epochs", real)
    assert (wd_b / "ckpt" / "mid_task_snapshot_cbf_step.msgpack").exists()
    assert not (wd_b / "ckpt" / "mid_task_snapshot_inc_step.msgpack").exists()  # cleared

    cfg_b2 = make_cil_config(root, frames_root, train_ann, val_ann, wd_b,
                             starting_task=1, **common)
    CILTrainer(cfg_b2, dump_config=False).train()
    assert not (wd_b / "ckpt" / "mid_task_snapshot_cbf_step.msgpack").exists()

    va, _ = load_checkpoint(wd_a / "ckpt" / "ckpt_task_1.msgpack")
    vb, _ = load_checkpoint(wd_b / "ckpt" / "ckpt_task_1.msgpack")
    for a, b in zip(jax.tree.leaves(va), jax.tree.leaves(vb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snapshot_header_peek_and_legacy(tmp_path):
    """Current snapshots carry a length-prefixed meta header so
    peek_train_snapshot_meta never deserializes the (potentially huge)
    weight payload (ADVICE round-2); legacy headerless snapshots still
    peek and load via the full-parse fallback."""
    from flax import serialization

    from bdvcil_tpu.runtime.checkpoint import _SNAP_MAGIC, _to_host

    step_fn, state, tx, variables = _setup()
    path = tmp_path / "snap.msgpack"
    meta = dict(task=1, phase="inc_step", epoch=0, num_classes=5, run_token="abc123")
    save_train_snapshot(path, state, jax.random.PRNGKey(3), meta=meta)

    raw = path.read_bytes()
    assert raw.startswith(_SNAP_MAGIC)
    # peek must succeed from the header alone: truncate the file to just
    # past the header and it still returns the meta
    import json as _json

    n = int.from_bytes(raw[len(_SNAP_MAGIC):len(_SNAP_MAGIC) + 4], "little")
    head_only = tmp_path / "head.msgpack"
    head_only.write_bytes(raw[: len(_SNAP_MAGIC) + 4 + n])
    assert peek_train_snapshot_meta(head_only) == meta
    assert peek_train_snapshot_meta(path) == meta

    # legacy format: bare msgpack with meta inside (pre-header snapshots)
    legacy = tmp_path / "legacy.msgpack"
    payload = {
        "meta": _json.dumps(meta),
        "step": np.asarray(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(serialization.to_state_dict(state.opt_state)),
        "rng_key": np.asarray(jax.random.PRNGKey(3)),
    }
    legacy.write_bytes(serialization.msgpack_serialize(payload))
    assert peek_train_snapshot_meta(legacy) == meta
    restored, key, meta2 = load_train_snapshot(legacy, TrainState.create(variables, tx))
    assert meta2 == meta
    np.testing.assert_array_equal(np.asarray(key), np.asarray(jax.random.PRNGKey(3)))
    jax.tree.map(np.testing.assert_array_equal, jax.tree.leaves(state.params),
                 jax.tree.leaves(restored.params))


def test_snapshot_lineage_token_rejected(tmp_path):
    """A snapshot left by a DIFFERENT experiment (seed/split/method) in the
    same work_dir must be rejected by the trainer's lineage check; snapshots
    without a token (pre-run_token) stay restorable (ADVICE round-2)."""
    from bdvcil_tpu.cil.trainer import CILTrainer

    ok = CILTrainer._snapshot_lineage_ok

    class T1:
        _run_token = "aaaa"

    assert ok(T1(), {"run_token": "aaaa"})
    assert not ok(T1(), {"run_token": "bbbb"})
    assert ok(T1(), {})  # legacy snapshot: no token recorded
