import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdvcil_tpu.models import (
    CILRecognizer2D,
    IncrementalTSMHead,
    ResNetTSM,
    average_clips,
    build_model,
    init_model_params,
    update_fc,
)
from bdvcil_tpu.ops.tsm_shift import temporal_shift

T = 4  # small segment count for tests


def tiny_model_cfg(num_classes=5, depth=18, classifier="LocalSimilarityClassifier", loss="LSCLoss"):
    return dict(
        type="CILRecognizer2D",
        backbone=dict(type="ResNetTSM", depth=depth, num_segments=T, shift_div=8, norm_eval=False),
        cls_head=dict(
            type="IncrementalTSMHead",
            num_classes=num_classes,
            in_channels=512,
            inc_head_config=dict(type=classifier, out_features=num_classes, nb_proxies=1),
            num_segments=T,
            loss_cls=dict(type=loss),
            dropout_ratio=0.5,
        ),
        test_cfg=dict(average_clips="prob"),
    )


def test_temporal_shift_semantics():
    n, t, h, w, c = 2, T, 2, 2, 8
    x = np.arange(n * t * h * w * c, dtype=np.float32).reshape(n * t, h, w, c)
    out = np.asarray(temporal_shift(jnp.array(x), num_segments=t, shift_div=8))
    xt = x.reshape(n, t, h, w, c)
    ot = out.reshape(n, t, h, w, c)
    fold = c // 8  # = 1
    # first fold shifted backward: frame i sees frame i+1; last frame zero
    np.testing.assert_array_equal(ot[:, :-1, :, :, :fold], xt[:, 1:, :, :, :fold])
    assert (ot[:, -1, :, :, :fold] == 0).all()
    # second fold shifted forward
    np.testing.assert_array_equal(ot[:, 1:, :, :, fold : 2 * fold], xt[:, :-1, :, :, fold : 2 * fold])
    assert (ot[:, 0, :, :, fold : 2 * fold] == 0).all()
    # rest untouched
    np.testing.assert_array_equal(ot[:, :, :, :, 2 * fold :], xt[:, :, :, :, 2 * fold :])


def test_backbone_shapes_and_taps():
    model = ResNetTSM(depth=18, num_segments=T)
    x = jnp.zeros((T, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert feats["layer1"].shape == (T, 16, 16, 64)
    assert feats["layer4"].shape == (T, 2, 2, 512)
    assert feats["out"].shape == feats["layer4"].shape


def test_backbone_r50_channels():
    model = ResNetTSM(depth=50, num_segments=T)
    x = jnp.zeros((T, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False)
    assert feats["layer4"].shape[-1] == 2048


def test_recognizer_forward_shapes():
    spec = build_model(tiny_model_cfg())
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    module = spec.module()
    imgs = jnp.ones((2, T, 32, 32, 3))
    out = module.apply(variables, imgs, train=False)
    assert out["cls_score"].shape == (2, 1, 5)
    assert out["repr"].shape == (2, 1, 512)
    assert out["feats"]["cls_head.avg_pool"].shape == (2 * T, 512)
    # eta present for LSC loss
    assert "eta" in variables["params"]["head"]


def test_recognizer_multicrop_groups():
    spec = build_model(tiny_model_cfg())
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    module = spec.module()
    imgs = jnp.ones((2, 3 * T, 32, 32, 3))  # 3 crops
    out = module.apply(variables, imgs, train=False)
    assert out["cls_score"].shape == (2, 3, 5)
    avg = average_clips(out["cls_score"], "prob")
    assert avg.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(avg.sum(-1)), 1.0, rtol=1e-5)


def test_lsc_scores_bounded():
    """LSC outputs are softmax-weighted cosine similarities -> within [-1, 1]."""
    head = IncrementalTSMHead(
        num_classes=6, in_channels=32, num_segments=T, classifier_type="LocalSimilarityClassifier", nb_proxies=3
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (T * 2, 3, 3, 32))
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    out = head.apply(variables, x, train=False)
    scores = np.asarray(out["cls_score"])
    assert scores.shape == (2, 6)
    assert (scores <= 1.0 + 1e-5).all() and (scores >= -1.0 - 1e-5).all()


def test_update_fc_grows_and_preserves():
    spec = build_model(tiny_model_cfg(num_classes=5))
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    old_w = np.asarray(variables["params"]["head"]["fc_weights"])
    grown = spec.grow_params(variables, 8, jax.random.PRNGKey(1))
    new_w = np.asarray(grown["params"]["head"]["fc_weights"])
    assert new_w.shape[0] == 8
    np.testing.assert_array_equal(new_w[:5], old_w)
    # original untouched
    assert variables["params"]["head"]["fc_weights"].shape[0] == 5

    # grown module runs
    module = spec.module(8)
    out = module.apply(grown, jnp.ones((1, T, 32, 32, 3)), train=False)
    assert out["cls_score"].shape == (1, 1, 8)


def test_update_fc_linear_head():
    spec = build_model(tiny_model_cfg(classifier="SimpleLinear", loss="CrossEntropyLoss"))
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    assert "eta" not in variables["params"]["head"]
    grown = spec.grow_params(variables, 7, jax.random.PRNGKey(1))
    assert grown["params"]["head"]["fc_weight"].shape == (7, 512)
    assert grown["params"]["head"]["fc_bias"].shape == (7,)
    np.testing.assert_array_equal(
        np.asarray(grown["params"]["head"]["fc_bias"][:5]),
        np.asarray(variables["params"]["head"]["fc_bias"]),
    )


def test_update_fc_shrink_raises():
    spec = build_model(tiny_model_cfg(num_classes=5))
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    with pytest.raises(ValueError):
        spec.grow_params(variables, 3, jax.random.PRNGKey(1))


def test_batch_stats_update_in_train_mode():
    spec = build_model(tiny_model_cfg())
    variables = init_model_params(spec, jax.random.PRNGKey(0), (1, T, 32, 32, 3))
    module = spec.module()
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, T, 32, 32, 3))
    out, mutated = module.apply(
        variables, imgs, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(3)}
    )
    before = np.asarray(variables["batch_stats"]["backbone"]["bn1"]["mean"])
    after = np.asarray(mutated["batch_stats"]["backbone"]["bn1"]["mean"])
    assert not np.array_equal(before, after)


@pytest.mark.slow
def test_fused_shift_matches_pad_shift():
    """shift_mode='fused' (conv-linearity decomposition) must equal the
    materialized-shift path numerically, fwd and grad."""
    from bdvcil_tpu.models.resnet_tsm import ResNetTSM

    x = jax.random.normal(jax.random.PRNGKey(0), (2 * T, 32, 32, 3))
    pad = ResNetTSM(depth=18, num_segments=T, shift_mode="pad")
    fused = ResNetTSM(depth=18, num_segments=T, shift_mode="fused")
    variables = pad.init(jax.random.PRNGKey(1), x, train=False)
    # identical param trees: fused reuses the same 'conv1/kernel' layout
    out_pad = pad.apply(variables, x, train=False)["out"]
    out_fused = fused.apply(variables, x, train=False)["out"]
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_pad), rtol=2e-4, atol=2e-4)

    def loss_pad(p):
        return jnp.sum(pad.apply({**variables, "params": p}, x, train=False)["out"] ** 2)

    def loss_fused(p):
        return jnp.sum(fused.apply({**variables, "params": p}, x, train=False)["out"] ** 2)

    g1 = jax.grad(loss_pad)(variables["params"])
    g2 = jax.grad(loss_fused)(variables["params"])
    k1 = np.asarray(g1["layer2_0"]["conv1"]["kernel"])
    k2 = np.asarray(g2["layer2_0"]["conv1"]["kernel"])
    np.testing.assert_allclose(k2, k1, rtol=2e-3, atol=2e-4)


def test_s2d_stem_matches_conv_stem():
    """Space-to-depth stem must equal the plain 7x7/s2 stem numerically."""
    from bdvcil_tpu.models.resnet_tsm import ResNetTSM

    x = jax.random.normal(jax.random.PRNGKey(0), (T, 64, 64, 3))
    conv = ResNetTSM(depth=18, num_segments=T, stem_mode="conv")
    s2d = ResNetTSM(depth=18, num_segments=T, stem_mode="s2d")
    variables = conv.init(jax.random.PRNGKey(1), x, train=False)
    # identical param layout (conv1/kernel (7,7,3,64))
    assert variables["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    out_conv = conv.apply(variables, x, train=False)["out"]
    out_s2d = s2d.apply(variables, x, train=False)["out"]
    np.testing.assert_allclose(
        np.asarray(out_s2d), np.asarray(out_conv), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_fused_block_shift_matches_pad():
    """shift_mode='fused_block' (Pallas residual+relu+shift epilogue) must
    match the materialized-shift path, forward and gradient."""
    from bdvcil_tpu.models.resnet_tsm import ResNetTSM

    x = jax.random.normal(jax.random.PRNGKey(0), (2 * T, 32, 32, 3))
    pad = ResNetTSM(depth=18, num_segments=T, shift_mode="pad")
    fb = ResNetTSM(depth=18, num_segments=T, shift_mode="fused_block")
    variables = pad.init(jax.random.PRNGKey(1), x, train=False)
    out_pad = pad.apply(variables, x, train=False)
    out_fb = fb.apply(variables, x, train=False)
    for tap in ("layer1", "layer4", "out"):
        np.testing.assert_allclose(
            np.asarray(out_fb[tap]), np.asarray(out_pad[tap]), rtol=2e-4, atol=2e-4
        )

    def loss(module, p):
        return jnp.sum(module.apply({**variables, "params": p}, x, train=False)["out"] ** 2)

    g_pad = jax.grad(lambda p: loss(pad, p))(variables["params"])
    g_fb = jax.grad(lambda p: loss(fb, p))(variables["params"])
    for path in (("conv1", "kernel"), ("layer2_0", "conv1", "kernel"), ("layer4_1", "conv2", "kernel")):
        a, b = g_pad, g_fb
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-4)
