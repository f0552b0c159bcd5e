"""Exact-equivalence tests for the Pallas conv1x1+BN-stats path
(ops/conv1x1_bn.py): conv1x1_mode='pallas_stats' must reproduce the default
XLA path — forward, gradients, and batch_stats updates — like the shift
variants were tested (PERF_NOTES)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdvcil_tpu.models import build_model, init_model_params
from bdvcil_tpu.ops.conv1x1_bn import gemm_with_stats


def test_gemm_with_stats_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((448 * 2, 96)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((96, 128)) * 0.05, jnp.bfloat16)
    y, s1, s2 = gemm_with_stats(x, w, True)
    yr = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)
    # one-ulp accumulation-order tolerance on the bf16 output
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), rtol=2e-2, atol=2e-2
    )
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(np.asarray(s1), yf.sum(0), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), (yf * yf).sum(0), rtol=1e-5, atol=1e-4)


def test_gemm_with_stats_pads_odd_rows():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((100, 32)), jnp.bfloat16)  # no tile divisor
    w = jnp.asarray(rng.standard_normal((32, 128)) * 0.1, jnp.bfloat16)
    y, s1, s2 = gemm_with_stats(x, w, True)
    assert y.shape == (100, 128)
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(np.asarray(s1), yf.sum(0), rtol=1e-5, atol=1e-4)


def _cfg(mode):
    t = 2
    return dict(
        type="CILRecognizer2D",
        backbone=dict(
            type="ResNetTSM", depth=50, num_segments=t, shift_div=8,
            conv1x1_mode=mode,
        ),
        cls_head=dict(
            type="IncrementalTSMHead", num_classes=3, in_channels=2048,
            inc_head_config=dict(type="SimpleLinear", out_features=3),
            num_segments=t, loss_cls=dict(type="CrossEntropyLoss"),
            dropout_ratio=0.0,
        ),
        test_cfg=dict(average_clips="prob"),
    )


@pytest.mark.slow  # 70s+ full-backbone Pallas-interpret run; option is non-default
def test_bottleneck_pallas_stats_matches_xla_forward_grads_and_stats():
    t = 2
    spec_x = build_model(_cfg("xla"))
    spec_p = build_model(_cfg("pallas_stats_interpret"))
    variables = init_model_params(spec_x, jax.random.PRNGKey(0), (1, t, 32, 32, 3))
    mx, mp = spec_x.module(), spec_p.module()

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, t, 32, 32, 3)), jnp.float32)

    # eval forward (running stats path)
    out_x = mx.apply(variables, x, train=False)
    out_p = mp.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_p["cls_score"]), np.asarray(out_x["cls_score"]), rtol=1e-4, atol=1e-4
    )

    # train forward + batch_stats updates (kernel-emitted statistics)
    def loss(m):
        def f(params):
            out, mut = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return out["cls_score"].astype(jnp.float32).sum(), mut
        return f

    (lx, mut_x), gx = jax.value_and_grad(loss(mx), has_aux=True)(variables["params"])
    (lp, mut_p), gp = jax.value_and_grad(loss(mp), has_aux=True)(variables["params"])
    # stats summation order differs per tile; drift amplifies ~50 layers
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-3)

    # every BN running-stat update equal (incl. the kernel-emitted ones)
    flat_x = jax.tree_util.tree_leaves_with_path(mut_x["batch_stats"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"]))
    assert len(flat_x) == len(flat_p)
    for path, leaf in flat_x:
        # tolerance covers bf16 accumulation-order drift through 50 layers;
        # a semantic error (wrong stats formula) differs by O(1)
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf), rtol=2e-3, atol=1e-3,
            err_msg=str(path),
        )

    # NOTE: full-model gradients are NOT compared — an untrained 50-layer
    # BN resnet's gradient is chaotically ill-conditioned (measured: a 1e-6
    # relative input perturbation moves some leaf grads by 33%), so any
    # cross-implementation fp drift explodes. Per-block gradients are
    # asserted tightly below instead.
    del gx, gp


def test_single_bottleneck_grads_and_stats_match_xla():
    """Tight f32 gradient equivalence at the block level (the full-model
    grad comparison is ill-conditioned; see note above)."""
    from bdvcil_tpu.models.resnet_tsm import _Bottleneck

    t = 2
    rng = np.random.default_rng(0)
    for stride, is_shift in [(1, True), (2, True), (1, False)]:
        def make(mode):
            return _Bottleneck(
                planes=8, stride=stride, num_segments=t, shift_div=8,
                is_shift=is_shift, dtype=jnp.float32, norm_dtype=jnp.float32,
                conv1x1_mode=mode,
            )

        mx, mp = make("xla"), make("pallas_stats_interpret")
        x = jnp.asarray(rng.standard_normal((2 * t, 8, 8, 32)), jnp.float32)
        vx = mx.init(jax.random.PRNGKey(0), x, True)

        def loss(m, params):
            out, mut = m.apply(
                {"params": params, "batch_stats": vx["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return (out.astype(jnp.float32) ** 2).sum(), mut

        (lx, mut_x), gx = jax.value_and_grad(
            lambda p: loss(mx, p), has_aux=True)(vx["params"])
        (lp, mut_p), gp = jax.value_and_grad(
            lambda p: loss(mp, p), has_aux=True)(vx["params"])
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
        for path, leaf in jax.tree_util.tree_leaves_with_path(gx):
            scale = max(float(np.abs(np.asarray(leaf)).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(flat_p[path]), np.asarray(leaf),
                rtol=1e-4, atol=1e-4 * scale,
                err_msg=f"stride={stride} shift={is_shift} {path}",
            )
        flat_sp = dict(jax.tree_util.tree_leaves_with_path(mut_p["batch_stats"]))
        for path, leaf in jax.tree_util.tree_leaves_with_path(mut_x["batch_stats"]):
            np.testing.assert_allclose(
                np.asarray(flat_sp[path]), np.asarray(leaf), rtol=1e-5, atol=1e-6,
                err_msg=str(path),
            )
