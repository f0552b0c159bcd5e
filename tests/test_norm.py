"""GroupedBatchNorm (per-device BN-stats parity option, VERDICT Weak #5)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bdvcil_tpu.models.norm import GroupedBatchNorm


def _data(key, n=8, h=4, w=4, c=6):
    return jax.random.normal(key, (n, h, w, c)) * 2.0 + 0.5


def test_groups_1_matches_flax_batchnorm_exactly():
    x = _data(jax.random.PRNGKey(0))
    ours = GroupedBatchNorm(use_running_average=False, groups=1)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v1 = ours.init(jax.random.PRNGKey(1), x)
    v2 = ref.init(jax.random.PRNGKey(1), x)
    y1, m1 = ours.apply(v1, x, mutable=["batch_stats"])
    y2, m2 = ref.apply(v2, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["mean"]), np.asarray(m2["batch_stats"]["mean"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["var"]), np.asarray(m2["batch_stats"]["var"]),
        rtol=1e-5, atol=1e-6,
    )


def test_grouped_equals_per_group_batchnorm():
    """groups=G output == running flax BatchNorm on each contiguous block
    independently (the reference's per-GPU semantics)."""
    g, per = 4, 2
    x = _data(jax.random.PRNGKey(2), n=g * per)
    ours = GroupedBatchNorm(use_running_average=False, groups=g)
    v = ours.init(jax.random.PRNGKey(1), x)
    y, m = ours.apply(v, x, mutable=["batch_stats"])

    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vr = ref.init(jax.random.PRNGKey(1), x[:per])
    group_means, group_vars, outs = [], [], []
    for k in range(g):
        blk = x[k * per : (k + 1) * per]
        yk, mk = ref.apply(vr, blk, mutable=["batch_stats"])
        outs.append(np.asarray(yk))
        # invert the EMA to recover the raw batch stats of the block
        group_means.append((np.asarray(mk["batch_stats"]["mean"]) - 0.9 * 0.0) / 0.1)
        group_vars.append((np.asarray(mk["batch_stats"]["var"]) - 0.9 * 1.0) / 0.1)
    np.testing.assert_allclose(np.asarray(y), np.concatenate(outs), rtol=3e-5, atol=3e-5)
    # running stats = EMA toward the average of the group statistics
    want_mean = 0.9 * 0.0 + 0.1 * np.mean(group_means, axis=0)
    want_var = 0.9 * 1.0 + 0.1 * np.mean(group_vars, axis=0)
    np.testing.assert_allclose(
        np.asarray(m["batch_stats"]["mean"]), want_mean, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m["batch_stats"]["var"]), want_var, rtol=1e-4, atol=1e-5
    )


def test_eval_mode_uses_running_stats():
    x = _data(jax.random.PRNGKey(3))
    mod = GroupedBatchNorm(use_running_average=True, groups=4)
    v = mod.init(jax.random.PRNGKey(1), x)
    ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    vr = ref.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(mod.apply(v, x)), np.asarray(ref.apply(vr, x)), rtol=2e-5, atol=2e-5
    )


def test_backbone_trains_with_per_device_bn_groups():
    """bn_groups='per_device' builds and takes a train step on the 8-device
    mesh; variable layout stays BatchNorm-compatible."""
    from bdvcil_tpu.models import build_model, init_model_params
    from bdvcil_tpu.optim import build_optimizer
    from bdvcil_tpu.parallel import make_mesh, replicate, shard_batch
    from bdvcil_tpu.runtime import TrainState, make_train_step

    t = 2
    cfg = dict(
        type="CILRecognizer2D",
        backbone=dict(
            type="ResNetTSM", depth=18, num_segments=t, shift_div=8,
            bn_groups="per_device",
        ),
        cls_head=dict(
            type="IncrementalTSMHead", num_classes=3, in_channels=512,
            inc_head_config=dict(type="SimpleLinear", out_features=3),
            num_segments=t, loss_cls=dict(type="CrossEntropyLoss"),
            dropout_ratio=0.5,
        ),
        test_cfg=dict(average_clips="prob"),
    )
    spec = build_model(cfg)
    assert spec.backbone_kwargs["bn_groups"] == 8
    variables = init_model_params(spec, jax.random.PRNGKey(0), (8, t, 32, 32, 3))
    assert "mean" in variables["batch_stats"]["backbone"]["bn1"]
    tx = build_optimizer(variables["params"], dict(type="SGD", lr=0.01, momentum=0.9))
    state = TrainState.create(variables, tx)
    step = make_train_step(spec, tx, num_classes=3, method="base", task_idx=0)

    mesh = make_mesh()
    state = replicate(state, mesh)
    imgs = np.random.default_rng(0).normal(size=(8, t, 32, 32, 3)).astype(np.float32)
    labels = np.arange(8, dtype=np.int64).reshape(8, 1) % 3
    put = shard_batch({"imgs": imgs, "label": labels}, mesh)
    state, metrics = step(state, None, put["imgs"], put["label"], {}, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

def test_stats_rows_matches_prefix_oracle():
    """stats_rows=k: statistics from x[:k] only, applied to all rows."""
    n, k = 8, 3
    x = _data(jax.random.PRNGKey(4), n=n)
    mod = GroupedBatchNorm(use_running_average=False, groups=1, stats_rows=k)
    v = mod.init(jax.random.PRNGKey(1), x)
    y, m = mod.apply(v, x, mutable=["batch_stats"])

    xs = np.asarray(x[:k], dtype=np.float32)
    mean = xs.mean(axis=(0, 1, 2))
    var = (xs**2).mean(axis=(0, 1, 2)) - mean**2
    want = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), want, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(m["batch_stats"]["mean"]), 0.1 * mean, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m["batch_stats"]["var"]), 0.9 + 0.1 * var, rtol=1e-4, atol=1e-5
    )


def test_stats_rows_full_equals_exact_path():
    """stats_rows = all rows reproduces the exact (full-batch) statistics."""
    n = 6
    x = _data(jax.random.PRNGKey(5), n=n)
    ghost = GroupedBatchNorm(use_running_average=False, groups=1, stats_rows=n)
    exact = GroupedBatchNorm(use_running_average=False, groups=1)
    v = ghost.init(jax.random.PRNGKey(1), x)
    y1, _ = ghost.apply(v, x, mutable=["batch_stats"])
    y2, _ = exact.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=3e-5, atol=3e-5)


def test_stats_rows_grouped_prefix_and_grads():
    """stats_rows composes with groups (per-group prefix) and is differentiable."""
    g, per, k = 2, 4, 2
    x = _data(jax.random.PRNGKey(6), n=g * per)
    mod = GroupedBatchNorm(use_running_average=False, groups=g, stats_rows=k)
    v = mod.init(jax.random.PRNGKey(1), x)
    y, _ = mod.apply(v, x, mutable=["batch_stats"])

    xg = np.asarray(x, dtype=np.float32).reshape(g, per, *x.shape[1:])
    outs = []
    for i in range(g):
        xs = xg[i, :k]
        mean = xs.mean(axis=(0, 1, 2))
        var = (xs**2).mean(axis=(0, 1, 2)) - mean**2
        outs.append((xg[i] - mean) / np.sqrt(var + 1e-5))
    np.testing.assert_allclose(
        np.asarray(y), np.concatenate(outs), rtol=3e-5, atol=3e-5
    )

    def loss(params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, mutable=["batch_stats"]
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss)(v["params"])
    assert np.isfinite(np.asarray(grads["scale"])).all()
    assert np.isfinite(np.asarray(grads["bias"])).all()
