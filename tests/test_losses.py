import jax
import jax.numpy as jnp
import numpy as np

from bdvcil_tpu.losses import (
    acm_smooth_ce,
    acm_smooth_targets,
    cross_entropy,
    feature_kd_loss,
    lsc_nca_loss,
    soft_target_ce,
)


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 1.0, 0.1], [0.5, 2.5, 0.0]])
    labels = jnp.array([0, 1])
    got = float(cross_entropy(logits, labels))
    p = jax.nn.log_softmax(logits)
    want = float(-(p[0, 0] + p[1, 1]) / 2)
    assert abs(got - want) < 1e-6


def test_soft_target_ce_reduces_to_ce_for_onehot():
    logits = jnp.array([[2.0, 1.0, 0.1], [0.5, 2.5, 0.0]])
    labels = jnp.array([0, 1])
    onehot = jax.nn.one_hot(labels, 3)
    assert abs(float(soft_target_ce(logits, onehot)) - float(cross_entropy(logits, labels))) < 1e-6


def test_lsc_nca_loss_basic_properties():
    # perfect similarity on the target, low elsewhere -> small loss
    good = jnp.array([[0.99, -0.5, -0.5]])
    bad = jnp.array([[-0.5, 0.99, -0.5]])
    t = jnp.array([0])
    eta = jnp.array([1.0])
    l_good = float(lsc_nca_loss(good, t, eta))
    l_bad = float(lsc_nca_loss(bad, t, eta))
    assert l_good < l_bad
    # hinge: loss never negative
    assert l_good >= 0.0


def test_lsc_nca_excluded_pos_denominator():
    """With the positive excluded, the denominator sums exp over negatives + 1
    (the zeroed positive slot contributes exp(0)=1)."""
    sims = jnp.array([[0.9, 0.1, -0.2]])
    t = jnp.array([0])
    eta = jnp.array([2.0])
    margin = 0.6
    s = 2.0 * (sims - margin)
    s = s - s.max()
    num = s[0, 0]
    denom = jnp.log(jnp.exp(s[0, 1]) + jnp.exp(s[0, 2]) + 1.0)
    want = float(jnp.clip(-(num - denom), min=0.0))
    got = float(lsc_nca_loss(sims, t, eta))
    assert abs(got - want) < 1e-6


def test_lsc_nca_fallback_is_ce():
    sims = jnp.array([[0.9, 0.1, -0.2], [0.2, 0.7, 0.0]])
    t = jnp.array([0, 1])
    got = float(lsc_nca_loss(sims, t, jnp.array([1.0]), exclude_pos_denominator=False))
    want = float(cross_entropy(sims, t))
    assert abs(got - want) < 1e-6


def test_acm_targets_lambda():
    labels = jnp.array([1, 2])
    bg = jnp.array([0, -1])
    fg = jnp.array([0.5, 1.0])
    y = acm_smooth_targets(labels, bg, fg, num_classes=3, alpha=4.0)
    lam0 = 1 - (1 - 0.5) ** 4
    np.testing.assert_allclose(np.asarray(y[0]), [1 - lam0, lam0, 0.0], rtol=1e-6)
    # fg_ratio == 1 -> pure one-hot regardless of bg label
    np.testing.assert_allclose(np.asarray(y[1]), [0.0, 0.0, 1.0], rtol=1e-6)


def test_acm_smooth_ce_sign():
    logits = jnp.array([[2.0, 1.0, 0.1]])
    labels = jnp.array([0])
    bg = jnp.array([-1])
    fg = jnp.array([1.0])
    correct = float(acm_smooth_ce(logits, labels, bg, fg, 3))
    assert correct > 0  # faithful (negated) semantics
    buggy = float(acm_smooth_ce(logits, labels, bg, fg, 3, buggy_sign=True))
    assert abs(buggy + correct) < 1e-6


def test_feature_kd_loss_weights_and_scale():
    cur = {"a": jnp.ones((4, 2, 2, 3)), "b": jnp.zeros((4, 8))}
    prev = {"a": jnp.zeros((4, 2, 2, 3)), "b": jnp.zeros((4, 8))}
    out = feature_kd_loss(cur, prev, ["a", "b"], [0.5, 2.0], scale_factor=3.0)
    assert abs(float(out["a"]) - 1.0) < 1e-6
    assert abs(float(out["b"])) < 1e-6
    assert abs(float(out["kd_loss"]) - 3.0 * 0.5 * 1.0) < 1e-6


def test_feature_kd_exemplar_only_mask():
    # 2 samples x 2 segments; sample 0 is old-class (label 0 < 1), sample 1 new
    cur = {"a": jnp.stack([jnp.ones((3,)), jnp.ones((3,)), 5 * jnp.ones((3,)), 5 * jnp.ones((3,))])}
    prev = {"a": jnp.zeros((4, 3))}
    labels = jnp.array([0, 1])
    out = feature_kd_loss(
        cur, prev, ["a"], [1.0], 1.0, labels=labels, prev_num_classes=1,
        exemplar_only=True, num_segments=2,
    )
    # only sample 0 (mse=1.0) counts; sample 1 (mse=25) masked out
    assert abs(float(out["kd_loss"]) - 1.0) < 1e-6


def test_feature_kd_stops_gradient_to_prev():
    def f(p):
        cur = {"a": p}
        prev = {"a": p * 2}
        return feature_kd_loss(cur, prev, ["a"], [1.0], 1.0)["kd_loss"]

    g = jax.grad(f)(jnp.ones((2, 2)))
    # d/dp mean((p - 2p)^2) with stop_grad on prev: 2*(p-2p)*1 / N = -2p/N... sign negative
    assert float(g.sum()) < 0


def test_weighted_losses_ignore_pad_rows():
    logits = jnp.array([[2.0, 1.0, 0.1], [0.5, 2.5, 0.0], [9.0, -9.0, 0.0]])
    labels = jnp.array([0, 1, 2])
    w = jnp.array([1.0, 1.0, 0.0])
    want = float(cross_entropy(logits[:2], labels[:2]))
    assert abs(float(cross_entropy(logits, labels, w)) - want) < 1e-6

    onehot = jax.nn.one_hot(labels, 3)
    want = float(soft_target_ce(logits[:2], onehot[:2]))
    assert abs(float(soft_target_ce(logits, onehot, w)) - want) < 1e-6

    sims = jnp.array([[0.9, 0.1, -0.2], [0.1, 0.8, 0.0], [0.0, 0.0, 0.99]])
    eta = jnp.array([1.0])
    want = float(lsc_nca_loss(sims[:2], labels[:2], eta))
    got = float(lsc_nca_loss(sims, labels, eta, sample_weights=w))
    # NOTE: the stability max-shift sees all rows incl. padded ones; rows are
    # shifted identically so the weighted mean still matches
    assert abs(got - want) < 1e-5


def test_feature_kd_sample_weights_mask_pad():
    cur = {"a": jnp.stack([jnp.ones((3,)), 5 * jnp.ones((3,))])}
    prev = {"a": jnp.zeros((2, 3))}
    out = feature_kd_loss(
        cur, prev, ["a"], [1.0], 1.0, sample_weights=jnp.array([1.0, 0.0]), num_segments=1
    )
    assert abs(float(out["kd_loss"]) - 1.0) < 1e-6
