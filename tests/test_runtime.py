import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdvcil_tpu.models import build_model, init_model_params
from bdvcil_tpu.optim import build_optimizer
from bdvcil_tpu.parallel import make_mesh, replicate, shard_batch
from bdvcil_tpu.runtime import (
    TrainState,
    load_checkpoint,
    make_eval_step,
    make_train_step,
    save_checkpoint,
)
from tests.test_models import tiny_model_cfg, T


def _opt_cfg(lr=0.01):
    return dict(
        type="SGD",
        constructor="CILTSMOptimizerConstructorImprovised",
        paramwise_cfg=dict(fc_lr_scale_factor=5.0),
        lr=lr,
        momentum=0.9,
        weight_decay=1e-4,
    )


def _setup(num_classes=5, method_loss=("LocalSimilarityClassifier", "LSCLoss")):
    classifier, loss = method_loss
    spec = build_model(tiny_model_cfg(num_classes=num_classes, classifier=classifier, loss=loss))
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    tx = build_optimizer(variables["params"], _opt_cfg())
    state = TrainState.create(variables, tx)
    return spec, variables, tx, state


def _batch(key, b=4, nc=5):
    imgs = jax.random.normal(key, (b, T, 32, 32, 3))
    labels = jax.random.randint(key, (b, 1), 0, nc)
    return imgs, labels


def test_base_step_runs_and_learns():
    spec, variables, tx, state = _setup()
    step = make_train_step(spec, tx, num_classes=5, method="base", task_idx=0)
    imgs, labels = _batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(8):
        state, metrics = step(state, None, imgs, labels, {}, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_base_step_with_kd():
    spec, variables, tx, state = _setup()
    kd = dict(
        module_names=["backbone.layer1", "backbone.layer4", "cls_head.avg_pool"],
        module_weights=[0.01, 0.01, 0.01],
        scale_factor=3.3,
        exemplar_only=False,
    )
    step = make_train_step(
        spec, tx, num_classes=5, method="base", task_idx=1, prev_num_classes=3, kd_config=kd
    )
    prev_variables = jax.tree.map(jnp.copy, variables)  # distinct buffers (donation contract)
    imgs, labels = _batch(jax.random.PRNGKey(2))
    state, metrics = step(state, prev_variables, imgs, labels, {}, jax.random.PRNGKey(0))
    assert float(metrics["kd_loss"]) >= 0
    assert "backbone.layer1" in metrics
    # prev model identical but current in train mode (BN batch stats) -> small but finite kd
    assert np.isfinite(float(metrics["loss"]))


def test_icarl_step():
    spec, variables, tx, state = _setup(method_loss=("SimpleLinear", "CrossEntropyLoss"))
    step = make_train_step(spec, tx, num_classes=5, method="icarl", task_idx=1, prev_num_classes=3)
    imgs, labels = _batch(jax.random.PRNGKey(3))
    prev_variables = jax.tree.map(jnp.copy, variables)
    state, metrics = step(state, prev_variables, imgs, labels, {}, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_cls"]))


def test_icarl_with_acm_metadata():
    spec, variables, tx, state = _setup(method_loss=("SimpleLinear", "CrossEntropyLoss"))
    step = make_train_step(spec, tx, num_classes=5, method="icarl", task_idx=0)
    imgs, labels = _batch(jax.random.PRNGKey(4))
    extra = {
        "foreground_ratio": jnp.array([1.0, 0.5, 0.8, 1.0]),
        "background_label": jnp.array([[-1], [2], [0], [-1]]),
    }
    state, metrics = step(state, None, imgs, labels, extra, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_cls"]))


def test_icarl_video_mix_step():
    spec, variables, tx, state = _setup(method_loss=("SimpleLinear", "CrossEntropyLoss"))
    step = make_train_step(
        spec, tx, num_classes=5, method="icarl_video_mix", task_idx=0,
        video_mix=dict(prob=1.0, alpha=1.0),
    )
    imgs, labels = _batch(jax.random.PRNGKey(5))
    state, metrics = step(state, None, imgs, labels, {}, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_cls"]))


def test_eval_step_outputs():
    spec, variables, tx, state = _setup()
    eval_step = make_eval_step(spec, num_classes=5)
    imgs = jax.random.normal(jax.random.PRNGKey(6), (2, 2 * T, 32, 32, 3))
    out = eval_step(variables, imgs)
    assert out["cls_score"].shape == (2, 2, 5)
    assert out["repr"].shape == (2, 2, 512)
    norms = np.linalg.norm(np.asarray(out["repr"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """The sharded step must produce the same update as single-device."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    spec, variables, tx, state = _setup()
    step = make_train_step(spec, tx, num_classes=5, method="base", task_idx=0, donate=False)
    imgs, labels = _batch(jax.random.PRNGKey(7), b=8)

    state_rep = replicate(state, mesh)
    put = shard_batch({"imgs": np.asarray(imgs), "label": np.asarray(labels)}, mesh)
    s1, m1 = step(state_rep, None, put["imgs"], put["label"], {}, jax.random.PRNGKey(0))
    s2, m2 = step(state, None, imgs, labels, {}, jax.random.PRNGKey(0))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    w1 = np.asarray(s1.params["head"]["fc_weights"])
    w2 = np.asarray(s2.params["head"]["fc_weights"])
    np.testing.assert_allclose(w1, w2, atol=1e-5)


def test_nchw_batch_accepted():
    spec, variables, tx, state = _setup()
    eval_step = make_eval_step(spec, num_classes=5)
    imgs = jax.random.normal(jax.random.PRNGKey(8), (2, T, 3, 32, 32))  # NCHW
    out = eval_step(variables, imgs)
    assert out["cls_score"].shape == (2, 1, 5)


def test_checkpoint_roundtrip(tmp_path):
    spec, variables, tx, state = _setup()
    path = tmp_path / "ckpt_task_0.msgpack"
    save_checkpoint(path, variables, meta={"num_classes": 5, "task": 0})
    restored, meta = load_checkpoint(path)
    assert meta["num_classes"] == 5
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["head"]["fc_weights"]),
        restored["params"]["head"]["fc_weights"],
    )
    # restored weights drive the model identically
    eval_step = make_eval_step(spec, num_classes=5)
    imgs = jax.random.normal(jax.random.PRNGKey(9), (1, T, 32, 32, 3))
    a = eval_step(variables, imgs)["cls_score"]
    b = eval_step({"params": restored["params"], "batch_stats": restored["batch_stats"]}, imgs)["cls_score"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from bdvcil_tpu.runtime.checkpoint import load_checkpoint_orbax, save_checkpoint_orbax

    spec, variables, tx, state = _setup()
    d = tmp_path / "orbax_ckpt"
    save_checkpoint_orbax(d, variables)
    restored = load_checkpoint_orbax(d)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["head"]["fc_weights"]),
        np.asarray(restored["params"]["head"]["fc_weights"]),
    )


@pytest.mark.slow
def test_padded_batch_step_matches_unpadded_loss():
    """A padded batch with sample weights must produce the same loss as the
    unpadded batch (metrics path; BN stats differ by design like the
    reference's variable last batch)."""
    spec, variables, tx, state = _setup()
    step = make_train_step(spec, tx, num_classes=5, method="base", donate=False)
    imgs, labels = _batch(jax.random.PRNGKey(1), b=4)

    _, m_ref = step(state, None, imgs[:2], labels[:2], {}, jax.random.PRNGKey(0))

    # pad 2 -> 4 by repeating rows, mask the pads
    padded_imgs = jnp.concatenate([imgs[:2], imgs[:2]], axis=0)
    padded_labels = jnp.concatenate([labels[:2], labels[:2]], axis=0)
    weights = jnp.array([1.0, 1.0, 0.0, 0.0])
    _, m_pad = step(
        state, None, padded_imgs, padded_labels, {"sample_weight": weights}, jax.random.PRNGKey(0)
    )
    # identical duplicated rows -> identical BN stats too, so loss_cls matches
    assert abs(float(m_pad["loss_cls"]) - float(m_ref["loss_cls"])) < 5e-3


@pytest.mark.slow
def test_hybrid_dcn_mesh_matches_single_device():
    """Hierarchical ('dcn','data') 2x4 mesh (TPU multislice layout) must be
    pure-DP-identical to single-device — batch_sharding spans both axes."""
    mesh = make_mesh(hybrid_shape=(2, 4))
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
    spec, variables, tx, state = _setup()
    step = make_train_step(spec, tx, num_classes=5, method="base", task_idx=0, donate=False)
    imgs, labels = _batch(jax.random.PRNGKey(11), b=8)

    state_rep = replicate(state, mesh)
    put = shard_batch({"imgs": np.asarray(imgs), "label": np.asarray(labels)}, mesh)
    s1, m1 = step(state_rep, None, put["imgs"], put["label"], {}, jax.random.PRNGKey(0))
    s2, m2 = step(state, None, imgs, labels, {}, jax.random.PRNGKey(0))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(s1.params["head"]["fc_weights"]),
        np.asarray(s2.params["head"]["fc_weights"]),
        atol=1e-5,
    )
