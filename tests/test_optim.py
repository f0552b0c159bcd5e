import jax
import jax.numpy as jnp
import numpy as np
import optax

from bdvcil_tpu.optim import build_lr_factor_fn, build_optimizer, label_params


def _fake_params():
    return {
        "backbone": {
            "conv1": {"kernel": jnp.ones((7, 7, 3, 64))},
            "bn1": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
            "layer1_0": {
                "conv1": {"kernel": jnp.ones((3, 3, 64, 64))},
                "bn1": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
                "downsample_conv": {"kernel": jnp.ones((1, 1, 64, 64))},
                "downsample_bn": {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))},
            },
        },
        "head": {"fc_weights": jnp.ones((5, 512)), "eta": jnp.ones((1,))},
    }


def test_labeling_policy():
    labels = label_params(_fake_params())
    assert labels["backbone"]["conv1"]["kernel"] == "first_conv_weight"
    assert labels["backbone"]["bn1"]["scale"] == "bn"
    assert labels["backbone"]["bn1"]["bias"] == "bn"
    assert labels["backbone"]["layer1_0"]["conv1"]["kernel"] == "normal_weight"
    assert labels["backbone"]["layer1_0"]["downsample_bn"]["bias"] == "bn"
    assert labels["head"]["fc_weights"] == "classifier_weight"
    assert labels["head"]["eta"] == "classifier_weight"


def test_linear_head_bias_labels():
    labels = label_params({"head": {"fc_weight": jnp.ones((5, 8)), "fc_bias": jnp.zeros((5,))}})
    assert labels["head"]["fc_weight"] == "classifier_weight"
    assert labels["head"]["fc_bias"] == "classifier_bias"


def test_multistep_factor():
    f = build_lr_factor_fn(dict(type="MultiStepLR", params=dict(milestones=[20, 30], gamma=0.1)))
    assert f(0) == 1.0 and f(19) == 1.0
    assert abs(f(20) - 0.1) < 1e-9 and abs(f(29) - 0.1) < 1e-9
    assert abs(f(30) - 0.01) < 1e-9


def test_step_exp_cosine_factors():
    f = build_lr_factor_fn(dict(type="StepLR", params=dict(step_size=10, gamma=0.5)))
    assert f(9) == 1.0 and f(10) == 0.5 and f(20) == 0.25
    f = build_lr_factor_fn(dict(type="ExponentialLR", params=dict(gamma=0.9)))
    assert abs(f(2) - 0.81) < 1e-9
    f = build_lr_factor_fn(dict(type="CosineAnnealingLR", params=dict(T_max=10)))
    assert abs(f(0) - 1.0) < 1e-9 and abs(f(10)) < 1e-9
    assert build_lr_factor_fn(None)(123) == 1.0


def _cfg(lr=0.1, momentum=0.0, wd=0.0, fc_scale=5.0):
    return dict(
        type="SGD",
        constructor="CILTSMOptimizerConstructorImprovised",
        paramwise_cfg=dict(fc_lr_scale_factor=fc_scale),
        lr=lr,
        momentum=momentum,
        weight_decay=wd,
    )


def test_sgd_first_step_matches_torch_semantics():
    params = {
        "backbone": {"layer1_0": {"conv1": {"kernel": jnp.ones((2, 2))}}},
        "head": {"fc_weights": jnp.ones((3, 2))},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    tx = build_optimizer(params, _cfg(lr=0.1, momentum=0.9, wd=0.01))
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    # torch sgd step1: g' = g + wd*w = 1.01; buf = g'; update = -lr_group * buf
    got_conv = float(updates["backbone"]["layer1_0"]["conv1"]["kernel"][0, 0])
    assert abs(got_conv - (-0.1 * 1.01)) < 1e-6
    got_fc = float(updates["head"]["fc_weights"][0, 0])
    assert abs(got_fc - (-0.5 * 1.01)) < 1e-6  # 5x lr on classifier


def test_momentum_accumulates():
    params = {"backbone": {"layer1_0": {"conv1": {"kernel": jnp.ones((2,))}}}}
    grads = jax.tree.map(jnp.ones_like, params)
    tx = build_optimizer(params, _cfg(lr=1.0, momentum=0.5, wd=0.0))
    state = tx.init(params)
    u1, state = tx.update(grads, state, params)
    u2, state = tx.update(grads, state, params)
    assert abs(float(u1["backbone"]["layer1_0"]["conv1"]["kernel"][0]) + 1.0) < 1e-6
    assert abs(float(u2["backbone"]["layer1_0"]["conv1"]["kernel"][0]) + 1.5) < 1e-6


def test_schedule_drops_lr_at_milestone():
    params = {"backbone": {"layer1_0": {"conv1": {"kernel": jnp.ones((2,))}}}}
    grads = jax.tree.map(jnp.ones_like, params)
    tx = build_optimizer(
        params,
        _cfg(lr=1.0),
        lr_scheduler_cfg=dict(type="MultiStepLR", params=dict(milestones=[1], gamma=0.1)),
        steps_per_epoch=2,
    )
    state = tx.init(params)
    for i in range(2):  # epoch 0
        u, state = tx.update(grads, state, params)
        assert abs(float(u["backbone"]["layer1_0"]["conv1"]["kernel"][0]) + 1.0) < 1e-6
    u, state = tx.update(grads, state, params)  # epoch 1
    assert abs(float(u["backbone"]["layer1_0"]["conv1"]["kernel"][0]) + 0.1) < 1e-6


def test_grad_clip_and_accumulation():
    params = {"backbone": {"layer1_0": {"conv1": {"kernel": jnp.ones((2,))}}}}
    big = jax.tree.map(lambda p: 100 * jnp.ones_like(p), params)
    tx = build_optimizer(params, _cfg(lr=1.0), grad_clip=1.0)
    state = tx.init(params)
    u, _ = tx.update(big, state, params)
    norm = float(optax.global_norm(u))
    assert abs(norm - 1.0) < 1e-4

    tx = build_optimizer(params, _cfg(lr=1.0), accumulate_steps=2)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    u1, state = tx.update(grads, state, params)
    assert float(jnp.abs(u1["backbone"]["layer1_0"]["conv1"]["kernel"]).sum()) == 0.0
    u2, state = tx.update(grads, state, params)
    assert abs(float(u2["backbone"]["layer1_0"]["conv1"]["kernel"][0]) + 1.0) < 1e-6


def test_freeze_backbone_zeroes_backbone_updates():
    params = {
        "backbone": {"layer1_0": {"conv1": {"kernel": jnp.ones((2, 2))}},
                      "bn1": {"scale": jnp.ones((2,))}},
        "head": {"fc_weights": jnp.ones((3, 2))},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    tx = build_optimizer(params, _cfg(lr=0.1), freeze_backbone=True)
    state = tx.init(params)
    u, _ = tx.update(grads, state, params)
    assert float(jnp.abs(u["backbone"]["layer1_0"]["conv1"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(u["backbone"]["bn1"]["scale"]).sum()) == 0.0
    assert float(jnp.abs(u["head"]["fc_weights"]).sum()) > 0.0


def test_legacy_fc_lr5_flag():
    params = {"head": {"fc_weights": jnp.ones((3, 2))}}
    grads = jax.tree.map(jnp.ones_like, params)
    cfg = dict(type="SGD", paramwise_cfg=dict(fc_lr5=True), lr=1.0)
    tx = build_optimizer(params, cfg)
    state = tx.init(params)
    u, _ = tx.update(grads, state, params)
    assert abs(float(u["head"]["fc_weights"][0, 0]) + 5.0) < 1e-6


def test_fused_sgd_matches_multi_transform_chain():
    """The single-pass fused labeled SGD (optim._fused_labeled_sgd) must be
    numerically identical to the optax multi_transform chain across steps,
    groups, schedule milestones, and the CBF backbone freeze."""
    import jax
    import jax.numpy as jnp

    params = {
        "backbone": {
            "conv1": {"kernel": jnp.ones((3, 3, 3, 4)) * 0.5},
            "bn1": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
            "layer1_0": {"conv2": {"kernel": jnp.ones((3, 3, 4, 4)) * 0.2}},
        },
        "head": {"fc_weight": jnp.ones((5, 4)) * 0.1, "fc_bias": jnp.zeros(5)},
    }
    opt_cfg = dict(
        type="SGD", constructor="CILTSMOptimizerConstructorImprovised",
        paramwise_cfg=dict(fc_lr_scale_factor=5.0), lr=0.02, momentum=0.9,
        weight_decay=1e-3,
    )
    sched = dict(type="MultiStepLR", params=dict(milestones=[2], gamma=0.1))
    for freeze in (False, True):
        tx_f = build_optimizer(params, opt_cfg, sched, steps_per_epoch=2,
                               grad_clip=1.0, freeze_backbone=freeze, fused=True)
        tx_c = build_optimizer(params, opt_cfg, sched, steps_per_epoch=2,
                               grad_clip=1.0, freeze_backbone=freeze, fused=False)
        pf, pc = params, params
        sf, sc = tx_f.init(params), tx_c.init(params)
        for step in range(6):
            g = jax.tree.map(lambda p: jnp.full_like(p, 0.3 + 0.1 * step), params)
            uf, sf = tx_f.update(g, sf, pf)
            uc, sc = tx_c.update(g, sc, pc)
            pf = jax.tree.map(lambda p, u: p + u, pf, uf)
            pc = jax.tree.map(lambda p, u: p + u, pc, uc)
        for path, leaf in jax.tree_util.tree_leaves_with_path(pc):
            other = dict(jax.tree_util.tree_leaves_with_path(pf))[path]
            np.testing.assert_allclose(
                np.asarray(other), np.asarray(leaf), rtol=1e-6, atol=1e-7,
                err_msg=f"freeze={freeze} {path}",
            )


def test_frozen_backbone_excluded_from_clip_norm():
    """CBF semantics (round-5 root cause of the 6-stage parity flag): with
    the backbone frozen, the global-norm clip must see ONLY the trainable
    (head) gradients — torch's requires_grad=False params have no grads, so
    Lightning's gradient_clip_val=1.0 (cil.py:743) clips over the head
    alone. Before the fix, huge backbone grads inflated the clip norm and
    shrank every CBF head update by that factor."""
    params = {
        "backbone": {"layer1_0": {"conv1": {"kernel": jnp.ones((4, 4))}}},
        "head": {"fc_weights": jnp.ones((3, 2))},
    }
    grads = {
        # enormous backbone grad: must NOT influence the head update
        "backbone": {"layer1_0": {"conv1": {"kernel": 1e4 * jnp.ones((4, 4))}}},
        "head": {"fc_weights": 0.1 * jnp.ones((3, 2))},
    }
    for fused in (True, False):
        tx = build_optimizer(params, _cfg(lr=1.0), grad_clip=1.0,
                             freeze_backbone=True, fused=fused)
        state = tx.init(params)
        u, _ = tx.update(grads, state, params)
        # head grad norm = 0.1*sqrt(6) ~= 0.245 < 1.0 -> NO clipping; the
        # head update must be the full fc_lr-scaled SGD step (lr 1.0,
        # fc_scale 5, wd 0 from _cfg => update = -5 * 0.1 = -0.5/element)
        head = np.asarray(u["head"]["fc_weights"])
        expected = -5.0 * 0.1
        np.testing.assert_allclose(head, expected, rtol=1e-5,
                                   err_msg=f"fused={fused}")
        assert float(np.abs(np.asarray(
            u["backbone"]["layer1_0"]["conv1"]["kernel"])).sum()) == 0.0
